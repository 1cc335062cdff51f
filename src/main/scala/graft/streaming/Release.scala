package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** TRAINING-RELEASE publication over the maintained corpus — the verb
  * that binds together what the engine already proves piecewise: a
  * release IS (a time-travel generation of the curated corpus) ×
  * (the deterministic shard layout) × (the order-invariant corpus
  * fingerprint), recorded in ONE auditable manifest row.
  *
  *   - [[publish]] — materialize the corpus AS OF a committed manifest
  *     generation ([[StreamCurate.loadAt]] — bit-stable regardless of
  *     later appends/takedowns) through [[TextOps.writeShards]] (the
  *     loader-ready `shard=K/` layout, ONE shuffle), and commit a
  *     release-manifest row: (release, corpus_dir, gen, n_shards,
  *     n_docs, fingerprint). The fingerprint is [[TextOps
  *     .corpusFingerprint]] over (id, text) — the x62/x64 checksum a
  *     training site re-verifies without moving a byte. The META row
  *     is the commit point: a crashed publish leaves shards without
  *     meta — invisible to [[registry]], safely overwritten by the
  *     retry.
  *   - [[registry]] — every published release's manifest row; pure
  *     metadata (one tiny parquet per release).
  *   - [[audit]] — the CROSS-RELEASE takedown question x74 answers for
  *     one release: for a deleted id set, which RELEASES contained the
  *     docs, in how many shards, and how many tokens — computed from
  *     each release's PINNED generation (time travel), so a release
  *     published BEFORE the takedown audits exactly even though the
  *     live corpus has already forgotten. A release whose generation
  *     has been vacuumed past reports `readable = false` (the operator
  *     learns it can only be audited from its published shard bytes) —
  *     loud in the row, never an exception that kills the sweep.
  *
  * Scale shape: publish = one shuffle of the snapshot plus one
  * map-side-combined fingerprint scan; registry = O(releases) tiny
  * reads; audit = per READABLE release one column-pruned scan with the
  * broadcast-gated id join ([[TextOps.blastRadius]]'s cap) folding to
  * one row — the per-release loop is registry-sized (driver-side by
  * design: releases number in the tens, not the millions). */
object Release {

  private def relDir(root: String, name: String) = s"$root/$name"
  private def metaDir(root: String, name: String) = s"$root/$name/meta"
  /** Shard layout of a published release (loader entry point). */
  def shardsDir(root: String, name: String): String = s"$root/$name/shards"

  /** Publish the corpus at `gen` (None = latest, resolved and RECORDED
    * so the manifest always names an exact snapshot) as release `name`.
    * Returns the one manifest row. Refuses a name that is already
    * published (meta present); a crashed previous attempt (shards
    * without meta) is overwritten. */
  def publish(s: SparkSession, corpusDir: String, gen: Option[Int],
              releaseRoot: String, name: String, nShards: Int,
              idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(name.nonEmpty && !name.contains("/") && !name.startsWith("."),
      s"release names are single path segments, got '$name'")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val resolved = gen.orElse(Manifest.readWithGen(s, corpusDir).map(_._1))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed corpus state at $corpusDir"))
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(metaDir(releaseRoot, name))),
      s"release '$name' is already published at $releaseRoot — releases " +
        "are immutable; publish under a new name")
    val corpus = StreamCurate.loadAt(s, corpusDir, Some(resolved))
      .getOrElse(throw new IllegalArgumentException(
        s"corpus at $corpusDir has no rows at generation $resolved"))
      .select(col(idCol), col(textCol))
    TextOps.writeShards(corpus, idCol, nShards,
      shardsDir(releaseRoot, name))
    val fp = TextOps.corpusFingerprint(corpus, Seq(idCol, textCol),
      Seq.empty).head()
    val meta = s.range(1).select(
      lit(name).as("release"), lit(corpusDir).as("corpus_dir"),
      lit(resolved).as("gen"), lit(nShards).as("n_shards"),
      lit(fp.getLong(0)).as("n_docs"),
      lit(fp.getLong(1)).as("fingerprint"),
      lit(idCol).as("id_col"), lit(textCol).as("text_col"))
    // the meta write IS the commit point (errorifexists: of two racing
    // publishers of one name, exactly one commits)
    meta.coalesce(1).write.mode("errorifexists")
      .parquet(metaDir(releaseRoot, name))
    meta
  }

  /** Every published release's manifest row; None when nothing was
    * ever published. Pure metadata — one tiny parquet per release. */
  def registry(s: SparkSession, releaseRoot: String): Option[DataFrame] = {
    val root = new Path(releaseRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val metas = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(st => new Path(st.getPath, "meta"))
      .filter(p => Manifest.hasDataFiles(fs, p))
      .map(_.toString)
    if (metas.isEmpty) None
    else Some(s.read.parquet(metas: _*))
  }

  /** Shard-byte INTEGRITY check — the x64 story as a release verb: one
    * row per published release comparing the manifest's recorded
    * (n_docs, fingerprint) against a recompute over the on-disk shard
    * bytes a loader would actually read. `ok = false` names a release
    * whose artifact was truncated, re-written or swapped since publish
    * — the check a training site runs before the first step trains.
    * One column-pruned scan per release (id + text only). */
  def verifyShards(s: SparkSession, releaseRoot: String): DataFrame = {
    val reg = registry(s, releaseRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no published releases at $releaseRoot"))
    val metas = reg.select("release", "n_docs", "fingerprint", "id_col",
      "text_col").collect() // registry-sized by design
    metas.toSeq.map { m =>
      val (name, nDocs, fp, rid, rtx) = (m.getString(0), m.getLong(1),
        m.getLong(2), m.getString(3), m.getString(4))
      val got = TextOps.corpusFingerprint(
          s.read.parquet(shardsDir(releaseRoot, name))
            .select(col(rid), col(rtx)),
          Seq(rid, rtx), Seq.empty).head()
      s.range(1).select(lit(name).as("release"),
        lit(nDocs).as("n_docs_expected"),
        lit(got.getLong(0)).as("n_docs_actual"),
        lit(fp).as("fingerprint_expected"),
        lit(got.getLong(1)).as("fingerprint_actual"),
        lit(nDocs == got.getLong(0) && fp == got.getLong(1)).as("ok"))
    }.reduce(_ unionByName _)
  }

  /** Cross-release takedown audit: one row per published release —
    * (release, gen, readable, n_docs_affected, n_shards_affected,
    * n_tokens_affected). `ids` is a one-column frame named `idCol`;
    * per release it is renamed to that release's recorded id column.
    * Lineage is RECOMPUTED, never stored (the x74 contract: the shard
    * assignment is a pure md5 function of the id and the release's
    * recorded nShards). */
  def audit(s: SparkSession, releaseRoot: String, ids: DataFrame,
            idCol: String = "doc_id"): DataFrame = {
    val reg = registry(s, releaseRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no published releases at $releaseRoot"))
    val metas = reg.select("release", "corpus_dir", "gen", "n_shards",
      "id_col", "text_col").collect() // registry-sized by design
    require(metas.nonEmpty, s"no published releases at $releaseRoot")
    val rows = metas.toSeq.map { m =>
      val (name, dir, gen, nSh, rid, rtx) = (m.getString(0), m.getString(1),
        m.getInt(2), m.getInt(3), m.getString(4), m.getString(5))
      def row(readable: Boolean, docs: Long, shards: Long, toks: Long) =
        s.range(1).select(lit(name).as("release"), lit(gen).as("gen"),
          lit(readable).as("readable"),
          lit(docs).as("n_docs_affected"),
          lit(shards).as("n_shards_affected"),
          lit(toks).as("n_tokens_affected"))
      try {
        val corpus = StreamCurate.loadAt(s, dir, Some(gen)).getOrElse(
          throw new IllegalArgumentException(s"empty corpus at $dir"))
        val br = TextOps.blastRadius(corpus, rid, rtx,
            ids.select(col(idCol).as(rid)), nSh)
          .agg(count(lit(1)).as("sh"),
            coalesce(sum("n_affected"), lit(0L)).as("d"),
            coalesce(sum("n_tokens_affected"), lit(0L)).as("t"))
          .head()
        row(readable = true, docs = br.getLong(1), shards = br.getLong(0),
          toks = br.getLong(2))
      } catch {
        // the pinned generation was vacuumed past: the release can only
        // be audited from its published shard bytes — say so in the row
        case _: IllegalArgumentException =>
          row(readable = false, docs = 0L, shards = 0L, toks = 0L)
      }
    }
    rows.reduce(_ unionByName _)
  }
}
