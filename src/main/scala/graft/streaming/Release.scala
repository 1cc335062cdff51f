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
  *   - [[retire]] / [[gcPlan]] / [[gc]] — the lifecycle's closing
  *     verbs: retire turns a release registry-invisible at one atomic
  *     commit point (bytes stay on disk, the name stays claimed), gc
  *     reclaims retired releases that no LIVE release names as
  *     `based_on` — plan and act read ONE account so they cannot
  *     drift (the st22 discipline).
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
  private def statsDir(root: String, name: String) = s"$root/$name/shardstats"
  private def binStatsDir(root: String, name: String) = s"$root/$name/binstats"
  private def deltaDir(root: String, name: String) = s"$root/$name/delta"
  private def shardMapDir(root: String, name: String) = s"$root/$name/shardmap"
  private def retiredDir(root: String, name: String) = s"$root/$name/retiredmeta"
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
    require(!fs.exists(new Path(retiredDir(releaseRoot, name))),
      s"release '$name' was retired at $releaseRoot — retired names stay " +
        "claimed (reuse would alias two lineages in based_on provenance); " +
        "publish under a new name")
    val corpus = StreamCurate.loadAt(s, corpusDir, Some(resolved))
      .getOrElse(throw new IllegalArgumentException(
        s"corpus at $corpusDir has no rows at generation $resolved"))
      .select(col(idCol), col(textCol))
    val tmp = stageName(name)
    TextOps.writeShards(corpus, idCol, nShards,
      shardsDir(releaseRoot, tmp))
    // PER-SHARD stats (shard, n_docs, fingerprint) ride the release so
    // a later [[publishDelta]] diffs against RECORDED metadata instead
    // of rescanning this release's bytes — the nShards-row table is the
    // whole cost of that future saving. The global (n_docs,
    // fingerprint) folds from the same rows (xor is associative).
    // r14: fold the stats from the sink's MAINTAINED per-shard state
    // when it covers the published generation (pinned — partials are
    // immutable per-batch files, so there is no read-vs-resolve race):
    // publish then costs ONE corpus pass (writeShards' scan) instead of
    // two. Equality is triple-netted: FingerprintStateSpec pins
    // state ≡ sharded scan, verifyShards recomputes from the written
    // bytes, and the x77 oracle recomputes from raw in DuckDB.
    // ADVICE r14: every release-family hash site orders the payload
    // SORTED BY NAME — the maintained per-shard partials hash sorted
    // (StreamCurate.fpRowHash), so a declared-order hash here would
    // record differently-ordered fingerprints whenever idCol sorts
    // after textCol and verifyShards/compareReleases would then flag a
    // healthy release. One invariant, every site: sorted.
    //
    // PER-BIN stats (VERDICT r14 #6) ride next to the per-shard table:
    // ≤[[StreamCurate.FpShardBins]] (bin, n, xor) rows, the layout-free
    // form that folds EXACTLY to any power-of-two shard count — what
    // lets [[compareReleasesBinned]] compare releases with different
    // shard layouts at their coarser common one. From the maintained
    // state when it covers the snapshot (pure metadata); else both
    // tables fold from ONE (shard, bin)-grouped scan.
    val (stats, binStats) = StreamCurate.fingerprintShardState(s,
        corpusDir, nShards, Seq(idCol, textCol), Some(resolved)) match {
      case Some(st) =>
        (st, StreamCurate.fingerprintShardState(s, corpusDir,
            StreamCurate.FpShardBins, Seq(idCol, textCol), Some(resolved))
          .map(_.select(col("shard").as("bin"), col("n_rows"),
            col("fingerprint"))))
      case None =>
        val both = scanShardBinStats(s, corpus, idCol, textCol, nShards)
        (foldScanStats(s, both, byBin = false),
          Some(foldScanStats(s, both, byBin = true)))
    }
    stats.coalesce(1).write.mode("overwrite")
      .parquet(statsDir(releaseRoot, tmp))
    binStats.foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(binStatsDir(releaseRoot, tmp)))
    commitRelease(s, releaseRoot, tmp, name, corpusDir, resolved,
      nShards, idCol, textCol)
  }

  /** ONE scan of the snapshot grouped by (shard, bin) — ≤ FpShardBins
    * + nShards rows (a bin straddles two shards only when nShards does
    * not divide the bins); both the per-shard and the per-bin stats
    * tables fold from it exactly (sum/xor associativity), so the scan
    * fallback of [[publish]]/[[publishDelta]] prices per-bin stats at
    * zero extra passes. */
  private def scanShardBinStats(s: SparkSession, corpus: DataFrame,
                                idCol: String, textCol: String,
                                nShards: Int)
      : Array[(Int, Int, Long, Long)] =
    TextOps.corpusFingerprint(
        TextOps.trainingShards(corpus, idCol, nShards)
          .withColumn("bin",
            floor(TextOps.md5Uniform(col(idCol)) *
              StreamCurate.FpShardBins).cast("int"))
          .select(col("shard"), col("bin"), col(idCol), col(textCol)),
        Seq(idCol, textCol).sorted, Seq("shard", "bin"))
      .collect() // ≤ 1024 + nShards rows by construction
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  /** Fold the (shard, bin) scan rows to one of the two stats tables. */
  private def foldScanStats(s: SparkSession,
                            rows: Array[(Int, Int, Long, Long)],
                            byBin: Boolean): DataFrame = {
    import s.implicits._
    val keyed = rows.groupBy(r => if (byBin) r._2 else r._1).toSeq
      .map { case (k, rs) =>
        (k, rs.map(_._3).sum, rs.map(_._4).reduce(_ ^ _)) }
      .sortBy(_._1)
    keyed.toDF(if (byBin) "bin" else "shard", "n_rows", "fingerprint")
  }

  /** One publisher's private staging dir: everything (shards, stats,
    * delta report, meta) writes under `.tmp-<name>-<pid>` — two racing
    * publishers of one name can never interleave writes — and
    * [[commitRelease]]'s ATOMIC RENAME into `<name>` is the single
    * commit point (the [[Manifest]] discipline; same object-store
    * caveat — no atomic dir rename on S3, use an external arbiter).
    * Leading dot: [[registry]] skips staging dirs, and release names
    * are forbidden from starting with one. */
  private def stageName(name: String) =
    s".tmp-$name-${ProcessHandle.current.pid}"

  /** Fold the staged per-shard stats to the release's global (n_docs,
    * fingerprint), write the meta row into the staging dir, and
    * atomically rename the whole staged release into place — shared
    * commit tail of [[publish]] and [[publishDelta]]. A loser of the
    * rename race (target exists) deletes its staging and throws. */
  private def commitRelease(s: SparkSession, releaseRoot: String,
                            tmp: String, name: String, corpusDir: String,
                            gen: Int, nShards: Int, idCol: String,
                            textCol: String): DataFrame = {
    val agg = s.read.parquet(statsDir(releaseRoot, tmp))
      .agg(coalesce(sum("n_rows"), lit(0L)),
        coalesce(bit_xor(col("fingerprint")), lit(0L))).head()
    val meta = s.range(1).select(
      lit(name).as("release"), lit(corpusDir).as("corpus_dir"),
      lit(gen).as("gen"), lit(nShards).as("n_shards"),
      lit(agg.getLong(0)).as("n_docs"),
      lit(agg.getLong(1)).as("fingerprint"),
      lit(idCol).as("id_col"), lit(textCol).as("text_col"))
    meta.coalesce(1).write.mode("errorifexists")
      .parquet(metaDir(releaseRoot, tmp))
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val (src, dst) = (new Path(relDir(releaseRoot, tmp)),
      new Path(relDir(releaseRoot, name)))
    if (fs.exists(dst)) {
      // meta present = a committed release (concurrent publisher won);
      // retired marker present = a retired release whose bytes [[gc]]
      // owns (clobbering them here would bypass the GC account);
      // neither = a CRASHED publish's meta-less leftovers from the
      // pre-staging layout — clear them so the rename lands AT dst
      // (renaming onto an existing dir would nest inside it)
      if (Manifest.hasDataFiles(fs, new Path(metaDir(releaseRoot, name))) ||
          fs.exists(new Path(retiredDir(releaseRoot, name)))) {
        fs.delete(src, true)
        throw new IllegalArgumentException(
          s"release '$name' was published concurrently at $releaseRoot " +
            "— releases are immutable; publish under a new name")
      }
      fs.delete(dst, true)
    }
    if (!fs.rename(src, dst)) {
      fs.delete(src, true)
      throw new IllegalArgumentException(
        s"release '$name' was published concurrently at $releaseRoot — " +
          "releases are immutable; publish under a new name")
    }
    // ADVICE r13: on HDFS, rename(src, dst) with dst an EXISTING dir
    // (a concurrent publisher landed between the check above and our
    // rename) moves src INSIDE dst and returns true — the loser would
    // "succeed" and return a meta row the registry doesn't serve. The
    // staging name is pid-unique, so dst/<tmp> existing after a
    // successful rename is exactly that signature: clean up the nested
    // staging and throw like any other lost race. (Local FS renames
    // onto an existing dir return false and take the branch above —
    // ReleaseSpec pins the race by planting dst right before commit.)
    val nested = new Path(dst, tmp)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new IllegalArgumentException(
        s"release '$name' was published concurrently at $releaseRoot — " +
          "releases are immutable; publish under a new name")
    }
    meta
  }

  /** INCREMENTAL publication — the increment-family member for
    * releases (exact dedup has x36, BM25 has x49/x51, IVF has v28,
    * clusters x56 … a full [[publish]] rewrites every shard even when
    * a takedown touched 100 docs of a 100 TB corpus): publish `name`
    * at `gen` as a DELTA against the already-published `basedOn` —
    * rewrite ONLY the shards whose content changed, COPY the untouched
    * shards' bytes verbatim, drop shards the new snapshot emptied.
    *
    * The diff runs against `basedOn`'s RECORDED per-shard stats (the
    * nShards-row table [[publish]] commits) — the base release's shard
    * BYTES are never read on any path. The NEW side resolves through a
    * three-tier ladder, cheapest provable tier first (VERDICT r13 #3):
    * (1) the COMPOSED DIFF — [[StreamCurate.diffSegments]] splits the
    * manifest walk into forward-only segments across provably
    * content-neutral compaction folds, so even a post-fold delta costs
    * O(diff + touched shards) with zero snapshot scans (`via = diff` /
    * `diff_folded`); (2) the PER-SHARD STATE —
    * [[StreamCurate.fingerprintShardState]]'s maintained partials
    * decide rewritten/copied/emptied from pure metadata when the walk
    * is unprovable (vacuumed intermediates), content then read only
    * for changed shards (`via = state`); (3) the SNAPSHOT SCAN — one
    * scan fingerprints every shard (`via = scan`). At scale a
    * takedown-sized change rewrites ~|touched docs| shards out of
    * thousands and byte-copies the rest (server-side on object
    * stores). The shard assignment is a pure function of the id (the
    * x37/x74 contract), so "changed" is decidable per shard by
    * fingerprint: identical (n, xor-of-row-hashes) ⇒ identical rows.
    *
    * The result is a FULL, self-contained release — same meta schema,
    * same audit/verify surface, indistinguishable from a scratch
    * [[publish]] of the same snapshot (ReleaseSpec pins content
    * equality + verifyShards) — plus a one-row DELTA REPORT
    * ([[deltaReport]]): (release, based_on, base_gen, gen, n_shards,
    * n_shards_rewritten, n_shards_copied, n_shards_emptied).
    *
    * `link = true` (r15) publishes the O(TOUCHED) form: untouched
    * shards are RECORDED as references (a shardmap row naming each
    * shard's physical owner, collapsed transitively at publish)
    * instead of byte-copied — the publication cost drops from
    * O(corpus bytes) to O(touched shards + metadata), which at 100 TB
    * is the difference between hours and seconds for a takedown-sized
    * change. [[loadShards]] is the loader that resolves references
    * (one partition-pruned read per distinct owner — same cost as
    * reading a materialized release); [[verifyShards]] verifies
    * through them (a tampered owner shard flips the linked release
    * too); [[gcAccount]]'s transitive `based_on` closure keeps every
    * physical owner on disk while a linked release lives. Trade-off:
    * a linked release is not byte-self-contained — exporting it to
    * another site means materializing (a scratch [[publish]] of the
    * same generation, or copying through [[loadShards]]). */
  def publishDelta(s: SparkSession, corpusDir: String, gen: Option[Int],
                   releaseRoot: String, name: String, basedOn: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   link: Boolean = false)
      : DataFrame = {
    require(name.nonEmpty && !name.contains("/") && !name.startsWith("."),
      s"release names are single path segments, got '$name'")
    val (nShards, bGen, baseBy) =
      baseForDelta(s, releaseRoot, basedOn, corpusDir, idCol, textCol)
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(metaDir(releaseRoot, name))),
      s"release '$name' is already published at $releaseRoot — releases " +
        "are immutable; publish under a new name")
    require(!fs.exists(new Path(retiredDir(releaseRoot, name))),
      s"release '$name' was retired at $releaseRoot — retired names stay " +
        "claimed (reuse would alias two lineages in based_on provenance); " +
        "publish under a new name")
    val resolved = gen.orElse(Manifest.readWithGen(s, corpusDir).map(_._1))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed corpus state at $corpusDir"))
    val tmp = stageName(name)
    // Strategy ladder, cheapest provable tier wins (VERDICT r13 #3):
    //
    //  1. COMPOSED DIFF ([[StreamCurate.diffSegments]] — generalizes
    //     the r13 forward-only check ACROSS COMPACTION FOLDS): the
    //     manifest walk base→target splits into forward-only segments
    //     separated by provably content-neutral folds; each segment's
    //     [[StreamCurate.diffSnapshots]] rides the delta-sized fast
    //     path and the per-shard stats FOLD from the base's recorded
    //     rows (xor is self-inverse). Cost: O(diff + touched shards) —
    //     neither the base's bytes nor the new snapshot's bulk is ever
    //     read; a fold-only window (republish after compaction) reads
    //     ZERO corpus bytes and byte-copies every shard.
    //  2. PER-SHARD STATE ([[StreamCurate.fingerprintShardState]] —
    //     when the walk is NOT provable, e.g. vacuumed intermediates,
    //     but the maintained per-shard partials cover the live corpus
    //     and the release hashes exactly the corpus payload): the
    //     rewritten/copied/emptied DECISION folds from metadata — zero
    //     corpus bytes — and only the changed shards' content is read
    //     (one snapshot scan, writes ∝ changed shards).
    //  3. SNAPSHOT SCAN (always available): one scan fingerprints
    //     every shard; base bytes still never read.
    val segments = StreamCurate.diffSegments(s, corpusDir, bGen, resolved)
    val stateBy: Option[Map[Int, (Long, Long)]] =
      if (segments.isEmpty)
        StreamCurate.fingerprintShardState(s, corpusDir, nShards,
            Seq(idCol, textCol), Some(resolved))
          .map(_.collect().map(r =>
            r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
      else None
    // the base's recorded PER-BIN stats (VERDICT r14 #6) — absent on
    // releases published before the binstats table existed; the new
    // release then carries none either (the diff can only fold from a
    // recorded base)
    val baseBins: Option[Map[Int, (Long, Long)]] =
      if (Manifest.hasDataFiles(fs,
          new Path(binStatsDir(releaseRoot, basedOn))))
        Some(s.read.parquet(binStatsDir(releaseRoot, basedOn)).collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
      else None
    // the maintained per-bin state pinned at the target generation —
    // the state/scan tiers' binstats source (pure metadata)
    def binsFromState(): Option[Map[Int, (Long, Long)]] =
      StreamCurate.fingerprintShardState(s, corpusDir,
          StreamCurate.FpShardBins, Seq(idCol, textCol), Some(resolved))
        .map(_.collect().map(r =>
          r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
    val folded = !(bGen == resolved ||
      segments.contains(Seq((bGen, resolved))))
    val (newBy, newBins, rewritten, copied, emptied, via) = if (
        segments.exists(_.isEmpty)) {
      // content-identical window: pure metadata republish — every base
      // shard byte-copies, zero corpus bytes read; binstats ride over
      // verbatim (same content, same bins)
      (baseBy, baseBins, Set.empty[Int], baseBy.keySet, Set.empty[Int],
        if (folded) "diff_folded" else "diff")
    } else if (segments.isDefined) {
      val d = TextOps.trainingShards(
          StreamCurate.diffAcross(s, corpusDir, segments.get, idCol)
            .select(col("change"), col(idCol), col(textCol)),
          idCol, nShards)
        // sorted-name hash order (ADVICE r14) — must fold against base
        // stats recorded by publish's state/scan tiers, which hash
        // sorted
        .withColumn("__h",
          TextOps.fingerprintHash(Seq(idCol, textCol).sorted))
        .persist()
      val deltaStats = d.groupBy("shard").agg(
          sum(when(col("change") === "added", 1L).otherwise(-1L))
            .as("dn"),
          bit_xor(col("__h")).as("dxor"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val nb = (baseBy.keySet ++ deltaStats.keySet).iterator.map { k =>
        val (bn, bf) = baseBy.getOrElse(k, (0L, 0L))
        val (dn, dx) = deltaStats.getOrElse(k, (0L, 0L))
        k -> ((bn + dn, bf ^ dx))
      }.filter(_._2._1 > 0).toMap
      // per-bin stats fold the same way when the base recorded them —
      // one more delta-sized aggregation on the persisted diff
      val nbBins = baseBins.map { bb =>
        val deltaBins = d.withColumn("__bin",
            floor(TextOps.md5Uniform(col(idCol)) *
              StreamCurate.FpShardBins).cast("int"))
          .groupBy("__bin").agg(
            sum(when(col("change") === "added", 1L).otherwise(-1L))
              .as("dn"),
            bit_xor(col("__h")).as("dxor"))
          .collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        (bb.keySet ++ deltaBins.keySet).iterator.map { k =>
          val (bn, bf) = bb.getOrElse(k, (0L, 0L))
          val (dn, dx) = deltaBins.getOrElse(k, (0L, 0L))
          k -> ((bn + dn, bf ^ dx))
        }.filter(_._2._1 > 0).toMap
      }
      val changed = deltaStats.keySet
      val rw = changed.filter(nb.contains)
      val cp = baseBy.keySet -- changed
      val em = changed.filter(k => !nb.contains(k) && baseBy.contains(k))
      // rebuild ONLY the touched shards: the base's bytes PARTITION-
      // PRUNED to the changed set (real pruning — the base layout is
      // shard-partitioned), minus the removed ids, plus the added rows
      if (rw.nonEmpty) {
        // loadShards (r15): resolves a LINKED base's references; for a
        // materialized base this is the same partition-pruned read as
        // before
        val baseRows = loadShards(s, releaseRoot, basedOn)
          .filter(col("shard").isInCollection(changed.toSeq))
          .select(col(idCol), col(textCol), col("shard"), col("pos"))
        val removedIds = d.filter(col("change") === "removed")
          .select(col(idCol)).distinct()
        val addedRows = d.filter(col("change") === "added")
          .select(col(idCol), col(textCol), col("shard"), col("pos"))
        baseRows.join(broadcast(removedIds), Seq(idCol), "left_anti")
          .unionByName(addedRows)
          .filter(col("shard").isInCollection(rw.toSeq))
          .repartition(rw.size, col("shard"))
          .sortWithinPartitions(col("shard"), col("pos"), col(idCol))
          .write.mode("overwrite").partitionBy("shard")
          .parquet(shardsDir(releaseRoot, tmp))
      }
      d.unpersist()
      (nb, nbBins, rw, cp, em, if (folded) "diff_folded" else "diff")
    } else {
      def writeChanged(rw: Set[Int]): Unit = if (rw.nonEmpty) {
        // content for the changed shards only — PARTITION-PRUNED when
        // the base generation is shard-clustered (VERDICT r14 #1:
        // [[StreamCurate.loadAtShards]] lists only the touched shards'
        // cluster dirs; the returned superset is cut exact by the
        // shard filter below, which was always there)
        val corpus = StreamCurate.loadAtShards(s, corpusDir,
            Some(resolved), nShards, rw)
          .getOrElse(throw new IllegalArgumentException(
            s"corpus at $corpusDir has no rows at generation $resolved"))
          .select(col(idCol), col(textCol))
        TextOps.trainingShards(corpus, idCol, nShards)
          .filter(col("shard").isInCollection(rw.toSeq))
          .repartition(rw.size, col("shard"))
          .sortWithinPartitions(col("shard"), col("pos"), col(idCol))
          .write.mode("overwrite").partitionBy("shard")
          .parquet(shardsDir(releaseRoot, tmp))
      }
      val (nb, nbBins, usedVia) = stateBy match {
        case Some(nbMap) =>
          // per-shard STATE tier: the whole decision from metadata —
          // binstats fold from the same maintained partials
          (nbMap, binsFromState(), "state")
        case None =>
          // snapshot-scan path: ONE (shard, bin)-grouped scan folds
          // both stats tables
          val corpus = StreamCurate.loadAt(s, corpusDir, Some(resolved))
            .getOrElse(throw new IllegalArgumentException(
              s"corpus at $corpusDir has no rows at generation $resolved"))
            .select(col(idCol), col(textCol))
          val both = scanShardBinStats(s, corpus, idCol, textCol, nShards)
          (both.groupBy(_._1).map { case (k, rs) =>
              k -> ((rs.map(_._3).sum, rs.map(_._4).reduce(_ ^ _))) },
            Some(both.groupBy(_._2).map { case (k, rs) =>
              k -> ((rs.map(_._3).sum, rs.map(_._4).reduce(_ ^ _))) }
              .toMap),
            "scan")
      }
      val rw = nb.keySet.filter(k => baseBy.get(k) != Some(nb(k)))
      val cp = nb.keySet.filter(k => baseBy.get(k) == Some(nb(k)))
      val em = baseBy.keySet -- nb.keySet
      // content for the changed shards: PARTITION-PRUNED to their
      // cluster dirs when the base generation is shard-clustered
      // (VERDICT r14 #1), WRITES ∝ changed shards (on the state tier a
      // no-change republish reads zero corpus bytes — rw is empty)
      writeChanged(rw)
      (nb, nbBins, rw, cp, em, usedVia)
    }
    // ADVICE r13: mirror publish's empty-corpus refusal — an
    // all-emptied delta would commit n_docs=0 with NO shards/ layout,
    // and verifyShards (and any loader) would then throw path-not-found
    // for the whole registry. Nothing is staged yet on this path
    // (rewritten is empty ⇒ no shard writes happened), but clear the
    // staging defensively before refusing.
    if (newBy.isEmpty) {
      fs.delete(new Path(relDir(releaseRoot, tmp)), true)
      throw new IllegalArgumentException(
        s"corpus at $corpusDir has no rows at generation $resolved — " +
          s"the delta against '$basedOn' would empty every shard; " +
          "refusing to publish an empty release")
    }
    if (link && copied.nonEmpty) {
      // LINKED (reference) release — the O(touched) publication
      // (r15): untouched shards are RECORDED, not copied — a
      // shardmap row (shard, owner) naming the release whose
      // `shards/shard=K` dir physically holds the bytes. Owners
      // resolve TRANSITIVELY AT PUBLISH (a linked base's map rows
      // pass through), so chains stay one hop at read time.
      // [[loadShards]] is the loader that resolves; [[gcAccount]]'s
      // transitive based_on closure (ADVICE r14) is exactly what
      // keeps every physical owner on disk while this release lives.
      val baseMap = readShardMap(s, releaseRoot, basedOn)
        .getOrElse(Map.empty[Int, String])
      locally {
        import s.implicits._
        copied.toSeq.sorted
          .map(k => (k, baseMap.getOrElse(k, basedOn)))
          .toDF("shard", "owner")
          .coalesce(1).write.mode("overwrite")
          .parquet(shardMapDir(releaseRoot, tmp))
      }
    } else if (copied.nonEmpty) {
      // byte-copy the untouched shards from the base release — on a
      // BOUNDED POOL, not serially: the copies are independent pure
      // IO, and the serial form became the whole delta wall at
      // production shard counts (r15 ScaleStress: 19.8 s at m=64/1024
      // shards, exponent 0.78 — the copy loop, not the decision or
      // the content read, both of which are flat; the pool halves it,
      // `link = true` removes it). On an object store each copy is a
      // server-side call and the pool shape is right there too. Any
      // failure cancels the publish (no partial-copy commit — the
      // staged dir never renames).
      fs.mkdirs(new Path(shardsDir(releaseRoot, tmp)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, copied.size))
      try {
        copied.toSeq.sorted.map { k =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              val src =
                new Path(s"${shardsDir(releaseRoot, basedOn)}/shard=$k")
              val dst = new Path(s"${shardsDir(releaseRoot, tmp)}/shard=$k")
              if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst,
                  false, s.sparkContext.hadoopConfiguration))
                throw new java.io.IOException(
                  s"copy of base shard $k failed")
            }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
    }
    locally {
      import s.implicits._
      newBy.toSeq.sortBy(_._1).map { case (k, (n, f)) => (k, n, f) }
        .toDF("shard", "n_rows", "fingerprint")
        .coalesce(1).write.mode("overwrite")
        .parquet(statsDir(releaseRoot, tmp))
      newBins.foreach(bins =>
        bins.toSeq.sortBy(_._1).map { case (k, (n, f)) => (k, n, f) }
          .toDF("bin", "n_rows", "fingerprint")
          .coalesce(1).write.mode("overwrite")
          .parquet(binStatsDir(releaseRoot, tmp)))
    }
    // the delta report rides the release (read back via [[deltaReport]])
    s.range(1).select(lit(name).as("release"),
        lit(basedOn).as("based_on"), lit(bGen).as("base_gen"),
        lit(resolved).as("gen"), lit(nShards).as("n_shards"),
        lit(rewritten.size.toLong).as("n_shards_rewritten"),
        lit(copied.size.toLong).as("n_shards_copied"),
        lit(emptied.size.toLong).as("n_shards_emptied"),
        lit(via).as("via"))
      .coalesce(1).write.mode("overwrite")
      .parquet(deltaDir(releaseRoot, tmp))
    commitRelease(s, releaseRoot, tmp, name, corpusDir, resolved,
      nShards, idCol, textCol)
    deltaReport(s, releaseRoot, name).get
  }

  /** Resolve a delta base: the registry row's recorded layout plus its
    * per-shard stats — the shared prologue of [[publishDelta]] and
    * [[deltaPreflight]], carrying the lineage/column/stats refusals
    * (ADVICE r13: a cross-corpus diff would byte-copy colliding shards
    * from the WRONG corpus into a release claiming this corpus's
    * generation). Returns (nShards, baseGen, per-shard stats map). */
  private def baseForDelta(s: SparkSession, releaseRoot: String,
                           basedOn: String, corpusDir: String,
                           idCol: String, textCol: String)
      : (Int, Int, Map[Int, (Long, Long)]) = {
    val base = registry(s, releaseRoot).toSeq.flatMap(_
        .filter(col("release") === basedOn).collect()).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"unknown base release '$basedOn' at $releaseRoot"))
    val (nShards, bGen) = (base.getAs[Int]("n_shards"), base.getAs[Int]("gen"))
    require(base.getAs[String]("id_col") == idCol &&
      base.getAs[String]("text_col") == textCol,
      s"delta must keep the base's columns (${base.getAs[String]("id_col")}" +
        s", ${base.getAs[String]("text_col")})")
    require(base.getAs[String]("corpus_dir") == corpusDir,
      s"base release '$basedOn' was published from " +
        s"${base.getAs[String]("corpus_dir")}, not $corpusDir — a delta " +
        "must extend the same corpus lineage; publish from scratch instead")
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(Manifest.hasDataFiles(fs,
        new Path(statsDir(releaseRoot, basedOn))),
      s"base release '$basedOn' carries no per-shard stats (published " +
        "by an earlier build) — delta-diffing would need a full base " +
        "scan; publish from scratch instead")
    val baseBy = s.read.parquet(statsDir(releaseRoot, basedOn)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (nShards, bGen, baseBy)
  }

  /** ZERO-BYTE pre-flight of [[publishDelta]] (the st22 plan-before-act
    * idea, applied to deltas): the rewrite/copy/empty account for
    * publishing the corpus at `gen` (None = latest) against `basedOn`,
    * decided ENTIRELY from metadata — the base's recorded per-shard
    * stats vs the sink's maintained per-shard fingerprint state pinned
    * at the same generation. No corpus bytes read, nothing staged,
    * nothing written: the operator prices a delta (how many shards
    * rewrite, how much of the release byte-copies) before paying for
    * it. One deltaReport-shaped row minus the release name. Throws
    * when the state cannot prove the snapshot (pre-upgrade dir,
    * non-power-of-two shard count, payload mismatch, vacuumed
    * partials) — the real [[publishDelta]] still has its diff/scan
    * tiers for those. */
  def deltaPreflight(s: SparkSession, corpusDir: String, gen: Option[Int],
                     releaseRoot: String, basedOn: String,
                     idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val (nShards, bGen, baseBy) =
      baseForDelta(s, releaseRoot, basedOn, corpusDir, idCol, textCol)
    val resolved = gen.orElse(Manifest.readWithGen(s, corpusDir).map(_._1))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed corpus state at $corpusDir"))
    val nb = StreamCurate.fingerprintShardState(s, corpusDir, nShards,
        Seq(idCol, textCol), Some(resolved))
      .getOrElse(throw new IllegalArgumentException(
        s"the per-shard fingerprint state cannot prove generation " +
          s"$resolved of $corpusDir at $nShards shards — run " +
          "publishDelta (its diff/scan tiers cover this) or compact " +
          "once to mint state coverage"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rw = nb.keySet.count(k => baseBy.get(k) != Some(nb(k)))
    val cp = nb.keySet.count(k => baseBy.get(k) == Some(nb(k)))
    val em = (baseBy.keySet -- nb.keySet).size
    s.range(1).select(lit(basedOn).as("based_on"),
      lit(bGen).as("base_gen"), lit(resolved).as("gen"),
      lit(nShards).as("n_shards"),
      lit(rw.toLong).as("n_shards_rewritten"),
      lit(cp.toLong).as("n_shards_copied"),
      lit(em.toLong).as("n_shards_emptied"))
  }

  /** CROSS-RELEASE per-shard comparison — WHICH shards diverged
    * between two published releases, from RECORDED metadata only (each
    * release's nShards-row stats table; zero shard bytes read, zero
    * corpus bytes read): one row per shard present in either release,
    * (shard, n_a, n_b, fp_a, fp_b, equal). The x64 audit ladder's
    * release rung — registry fingerprints prove global identity
    * (x77), THIS names the diverging shards, and the shard bytes (or
    * [[StreamCurate.diffSnapshots]] on the corpus) name the rows.
    * Requires equal shard counts: the md5 draw scales with nShards, so
    * different layouts have no shard-to-shard correspondence. */
  def compareReleases(s: SparkSession, releaseRoot: String,
                      a: String, b: String): DataFrame = {
    val reg = registry(s, releaseRoot).getOrElse(
        throw new IllegalArgumentException(
          s"no published releases at $releaseRoot"))
      .select("release", "n_shards").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    def shardsOf(n: String): Int = reg.getOrElse(n,
      throw new IllegalArgumentException(
        s"unknown release '$n' at $releaseRoot"))
    require(shardsOf(a) == shardsOf(b),
      s"shard layouts differ ('$a': ${shardsOf(a)}, '$b': ${shardsOf(b)})" +
        " — per-shard comparison needs one layout")
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def statsOf(n: String): DataFrame = {
      require(Manifest.hasDataFiles(fs,
          new Path(statsDir(releaseRoot, n))),
        s"release '$n' carries no per-shard stats at $releaseRoot")
      s.read.parquet(statsDir(releaseRoot, n))
    }
    val fa = statsOf(a).select(col("shard"),
      col("n_rows").as("n_a"), col("fingerprint").as("fp_a"))
    val fb = statsOf(b).select(col("shard"),
      col("n_rows").as("n_b"), col("fingerprint").as("fp_b"))
    fa.join(fb, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("fp_a"), col("fp_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          coalesce(col("fp_a"), lit(0L)) === coalesce(col("fp_b"), lit(0L)))
          .as("equal"))
  }

  /** CROSS-LAYOUT release comparison (VERDICT r14 #6) — the
    * [[compareReleases]] question for releases with DIFFERENT shard
    * counts, answered from each release's recorded PER-BIN stats (the
    * ≤[[StreamCurate.FpShardBins]]-row table [[publish]] commits):
    * both sides fold to the COARSER COMMON power-of-two layout — the
    * largest power of two ≤ min(nA, nB) (= that side's real shard
    * layout when it divides; a pure content partition otherwise) —
    * and compare per folded shard. Zero shard or corpus bytes, same
    * output schema as [[compareReleases]] with `shard` in the folded
    * layout. Refuses releases published before per-bin stats existed
    * (nothing recorded to fold). */
  def compareReleasesBinned(s: SparkSession, releaseRoot: String,
                            a: String, b: String): DataFrame = {
    val reg = registry(s, releaseRoot).getOrElse(
        throw new IllegalArgumentException(
          s"no published releases at $releaseRoot"))
      .select("release", "n_shards").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    def shardsOf(n: String): Int = reg.getOrElse(n,
      throw new IllegalArgumentException(
        s"unknown release '$n' at $releaseRoot"))
    val target = math.min(StreamCurate.FpShardBins,
      Integer.highestOneBit(math.min(shardsOf(a), shardsOf(b))))
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def binsOf(n: String): DataFrame = {
      require(Manifest.hasDataFiles(fs,
          new Path(binStatsDir(releaseRoot, n))),
        s"release '$n' carries no per-bin stats at $releaseRoot " +
          "(published by an earlier build) — cross-layout comparison " +
          "folds from recorded bins; re-publish or compare at equal " +
          "layouts")
      s.read.parquet(binStatsDir(releaseRoot, n))
        .groupBy(floor(col("bin") /
            (StreamCurate.FpShardBins / target)).cast("int").as("shard"))
        .agg(sum(col("n_rows")).as("n"),
          bit_xor(col("fingerprint")).as("fp"))
        .filter(col("n") > 0)
    }
    val fa = binsOf(a).select(col("shard"), col("n").as("n_a"),
      col("fp").as("fp_a"))
    val fb = binsOf(b).select(col("shard"), col("n").as("n_b"),
      col("fp").as("fp_b"))
    fa.join(fb, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("fp_a"), col("fp_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          coalesce(col("fp_a"), lit(0L)) === coalesce(col("fp_b"), lit(0L)))
          .as("equal"))
  }

  /** The one-row delta report of a [[publishDelta]] release; None for
    * scratch-published releases. */
  def deltaReport(s: SparkSession, releaseRoot: String, name: String)
      : Option[DataFrame] = {
    val p = new Path(deltaDir(releaseRoot, name))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!Manifest.hasDataFiles(fs, p)) None
    else Some(s.read.parquet(p.toString))
  }

  /** The recorded shard references of a LINKED release
    * ([[publishDelta]] `link = true`): shard → the release whose
    * physical `shards/` dir holds that shard's bytes. None for fully
    * materialized releases. Registry-sized metadata. */
  def readShardMap(s: SparkSession, releaseRoot: String, name: String)
      : Option[Map[Int, String]] = {
    val p = new Path(shardMapDir(releaseRoot, name))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!Manifest.hasDataFiles(fs, p)) None
    else Some(s.read.parquet(p.toString).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap)
  }

  /** THE LOADER ENTRY for a release's rows — resolves linked shards
    * (r15): a materialized release reads its own `shards/` dir
    * verbatim; a LINKED one ([[publishDelta]] `link = true`) unions
    * its physical (rewritten) shards with one partition-pruned read
    * per distinct physical OWNER of its referenced shards (owners were
    * collapsed to physical at publish, so this never chases a chain).
    * Schema identical either way: the payload columns + `pos` +
    * `shard`. The owner reads prune on the `shard=` partition column —
    * a linked release's load costs exactly what a materialized one's
    * does, without the corpus-sized copy at publish. */
  def loadShards(s: SparkSession, releaseRoot: String, name: String)
      : DataFrame = {
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val ownDir = shardsDir(releaseRoot, name)
    val own =
      if (Manifest.hasDataFiles(fs, new Path(ownDir)))
        Some(s.read.option("basePath", ownDir).parquet(ownDir))
      else None
    val linked = readShardMap(s, releaseRoot, name).map { m =>
      m.groupBy(_._2).toSeq.sortBy(_._1).map { case (owner, kvs) =>
        val od = shardsDir(releaseRoot, owner)
        s.read.option("basePath", od).parquet(od)
          .filter(col("shard").isInCollection(kvs.keys.toSeq))
      }.reduce(_ unionByName _)
    }
    (own, linked) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => throw new IllegalArgumentException(
        s"release '$name' has no shards at $releaseRoot")
    }
  }

  /** Every published release's manifest row; None when nothing was
    * ever published. Pure metadata — one tiny parquet per release. */
  def registry(s: SparkSession, releaseRoot: String): Option[DataFrame] = {
    val root = new Path(releaseRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val metas = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(st => new Path(st.getPath, "meta"))
      .filter(p => Manifest.hasDataFiles(fs, p))
      .map(_.toString)
    if (metas.isEmpty) None
    else Some(s.read.parquet(metas: _*))
  }

  /** RELEASE-AWARE retention pre-flight — the loop between the
    * registry and the vacuum dial, closed BEFORE the vacuum runs: for
    * every published release, would its pinned corpus generation
    * survive a `vacuumHistory(retainMillis)` on its corpus? One row
    * per release: (release, corpus_dir, gen, auditable_now — the
    * generation is currently committed history — and auditable_after —
    * it is in the vacuum's kept set). `auditable_after = false` names
    * a release the proposed retention would orphan: its takedown
    * audits ([[audit]]) would flip to `readable = false` and only the
    * published shard bytes would remain. The operator either runs the
    * vacuum anyway (the shard bytes ARE self-contained) or widens the
    * window. Pure manifest metadata — zero data reads, shared with the
    * real vacuum's account so plan and delete cannot drift. */
  def retentionImpact(s: SparkSession, releaseRoot: String,
                      retainMillis: Option[Long] = None): DataFrame = {
    val reg = registry(s, releaseRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no published releases at $releaseRoot"))
    val metas = reg.select("release", "corpus_dir", "gen").collect()
    require(metas.nonEmpty, s"no published releases at $releaseRoot")
    // one account per DISTINCT corpus dir (releases usually share one)
    val dirs = metas.map(_.getString(1)).distinct.map { d =>
      d -> (Manifest.generations(s, d).toSet,
        Manifest.keptGenerations(s, d, retainMillis).toSet)
    }.toMap
    metas.toSeq.map { m =>
      val (name, dir, gen) = (m.getString(0), m.getString(1), m.getInt(2))
      val (now, kept) = dirs(dir)
      // ADVICE r13: corpus_dir rides the row — with releases spanning
      // multiple corpus dirs, the operator must see WHICH corpus's
      // vacuum each row prices
      s.range(1).select(lit(name).as("release"),
        lit(dir).as("corpus_dir"),
        lit(gen).as("gen"),
        lit(now.contains(gen)).as("auditable_now"),
        lit(kept.contains(gen)).as("auditable_after"))
    }.reduce(_ unionByName _)
  }

  /** RETIRE a published release: remove it from the [[registry]] (and
    * so from every audit/verify/retention sweep) while its BYTES stay
    * on disk until [[gc]] reclaims them — the two-step deletion
    * discipline of every sink in this engine (tombstone now, reclaim
    * bytes later). One atomic rename of the meta dir to a retired
    * marker: the release turns registry-invisible at a single commit
    * point, the marker preserves the manifest row for [[gcPlan]]'s
    * account, and the NAME STAYS CLAIMED — publish refuses a retired
    * name, because reusing it would alias two different lineages in
    * later delta reports' `based_on` provenance. */
  def retire(s: SparkSession, releaseRoot: String, name: String): Unit = {
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val meta = new Path(metaDir(releaseRoot, name))
    require(Manifest.hasDataFiles(fs, meta),
      s"release '$name' is not published at $releaseRoot" +
        (if (fs.exists(new Path(retiredDir(releaseRoot, name))))
          " (already retired)" else ""))
    if (!fs.rename(meta, new Path(retiredDir(releaseRoot, name))))
      throw new IllegalArgumentException(
        s"could not retire release '$name' at $releaseRoot — " +
          "a concurrent retire already moved its meta")
  }

  /** The ONE GC account [[gcPlan]] and [[gc]] both read (the st22
    * lesson, applied to releases: plan and delete share an account so
    * they cannot drift): per on-disk release dir, (name, retired,
    * referenced) where `referenced` = some LIVE (registry-visible)
    * release's delta report names it as `based_on`. A retired base
    * stays on disk while a live delta's provenance chain needs it —
    * delta releases are byte-self-contained, but proving
    * delta ≡ base + changes needs the base's bytes. `referenced` is the
    * TRANSITIVE closure from the live set (ADVICE r14): with a chain
    * g3(live) = delta(g2 retired) = delta(g1 retired), g1 is still
    * pinned — proving g3 ≡ g1 + changes walks through g2's bytes AND
    * g1's, so the closure follows `based_on` edges through retired
    * intermediates until it stops growing. Registry-sized driver-side
    * metadata loop; dirs with neither meta nor retired marker (crashed
    * publishes) are publish-retry territory, not GC's. */
  private def gcAccount(s: SparkSession, releaseRoot: String)
      : Seq[(String, Boolean, Boolean)] = {
    val root = new Path(releaseRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val names = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
    def live(n: String) =
      Manifest.hasDataFiles(fs, new Path(metaDir(releaseRoot, n)))
    def retired(n: String) =
      Manifest.hasDataFiles(fs, new Path(retiredDir(releaseRoot, n)))
    val tracked = names.filter(n => live(n) || retired(n))
    // based_on edges for EVERY tracked release (retire moves only the
    // meta dir — a retired delta's report is still readable)
    val edges: Map[String, Seq[String]] = tracked.map { n =>
      n -> deltaReport(s, releaseRoot, n)
        .map(_.select("based_on").collect().map(_.getString(0)).toSeq)
        .getOrElse(Seq.empty)
    }.toMap
    // fixpoint from the live set: everything a live release's
    // provenance chain walks through stays referenced (ADVICE r14 —
    // the one-hop form reclaimed g1 under a live g3=delta(g2=delta(g1))
    // chain once g2 was retired)
    var referenced = Set.empty[String]
    var frontier = tracked.filter(live).toSet
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(n =>
        edges.getOrElse(n, Seq.empty)).toSet -- referenced
      referenced ++= next
      frontier = next
    }
    names.sorted.flatMap { n =>
      val (l, r) = (live(n), retired(n))
      if (!l && !r) None
      else Some((n, r && !l, referenced.contains(n)))
    }
  }

  /** GC DRY RUN — what [[gc]] would reclaim, without deleting a byte:
    * one row per on-disk release, (release, retired, referenced,
    * reclaimable = retired ∧ ¬referenced). */
  def gcPlan(s: SparkSession, releaseRoot: String): DataFrame =
    gcFrame(s, releaseRoot, gcAccount(s, releaseRoot), "reclaimable")

  /** Reclaim the BYTES of retired, unreferenced releases — the
    * vacuum-style closing verb of the release lifecycle
    * ([[publish]]/[[publishDelta]] → [[retire]] → gc). Deletes each
    * reclaimable release dir wholly; live releases and retired ones
    * still named `based_on` by a live delta are NEVER touched
    * (ReleaseSpec pins both). Returns the acted account: (release,
    * retired, referenced, reclaimed). Reads the SAME account as
    * [[gcPlan]], and is idempotent — a reclaimed dir is simply absent
    * from the next account. */
  def gc(s: SparkSession, releaseRoot: String): DataFrame = {
    val acct = gcAccount(s, releaseRoot)
    val fs = new Path(releaseRoot)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    acct.foreach { case (n, retired, referenced) =>
      if (retired && !referenced)
        fs.delete(new Path(relDir(releaseRoot, n)), true)
    }
    gcFrame(s, releaseRoot, acct, "reclaimed")
  }

  private def gcFrame(s: SparkSession, releaseRoot: String,
                      acct: Seq[(String, Boolean, Boolean)],
                      verb: String): DataFrame = {
    if (acct.isEmpty) throw new IllegalArgumentException(
      s"no published or retired releases at $releaseRoot")
    acct.map { case (n, r, ref) =>
      s.range(1).select(lit(n).as("release"), lit(r).as("retired"),
        lit(ref).as("referenced"), lit(r && !ref).as(verb))
    }.reduce(_ unionByName _)
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
      // loadShards (r15): a LINKED release verifies against the bytes
      // its references RESOLVE to — a tampered owner shard flips the
      // linked release's ok too, which is exactly the guarantee a
      // training site wants before reading through the references
      val got = TextOps.corpusFingerprint(
          loadShards(s, releaseRoot, name)
            .select(col(rid), col(rtx)),
          Seq(rid, rtx).sorted, Seq.empty).head() // sorted (ADVICE r14)
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
        // be audited from its published shard bytes — say so in the row.
        // ADVICE r13: a generation vacuumed BETWEEN the manifest read
        // and the blastRadius job surfaces executor-side (Spark job
        // failure caused by a missing partition read) rather than as
        // the driver-side IllegalArgumentException — map that to
        // readable=false too instead of killing the whole sweep;
        // genuinely unexpected failures still rethrow
        case _: IllegalArgumentException =>
          row(readable = false, docs = 0L, shards = 0L, toks = 0L)
        case e: Throwable if isMissingDataFailure(e) =>
          row(readable = false, docs = 0L, shards = 0L, toks = 0L)
      }
    }
    rows.reduce(_ unionByName _)
  }

  /** Does this failure's cause chain bottom out in "the data is gone"
    * (a vacuumed/deleted partition read) rather than a genuine engine
    * error? Walks causes for FileNotFound / path-does-not-exist — the
    * shapes both the driver-side analysis (`AnalysisException: Path
    * does not exist`) and an executor-side mid-scan deletion
    * (`SparkException` caused by `FileNotFoundException`) produce. */
  private def isMissingDataFailure(e: Throwable): Boolean = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16)
      .exists { t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
          Option(t.getMessage).exists(m =>
            m.contains("Path does not exist") ||
              m.contains("FileNotFoundException"))
      }
  }
}
