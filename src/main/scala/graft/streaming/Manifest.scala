package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Lucene-`segments_N`-style MANIFEST commit for the streamed on-disk
  * indexes ([[StreamBm25]], [[StreamIvf]]): the set of LIVE segment ids
  * lives in a numbered manifest file, and readers serve exactly the
  * latest committed set — never the directory listing. That closes the
  * two crash windows the directory-listing protocol had:
  *
  *   - append crash: a partially-committed postings partition (or a
  *     fully-written one whose metadata write died) is INVISIBLE until
  *     the manifest commit that includes it; the streaming engine's
  *     same-`batchId` retry wipes the orphan and rewrites.
  *   - compaction crash: the merged partition is invisible until the
  *     manifest flips, and after the flip the folded partitions are
  *     invisible even though their dirs still exist — at no point can a
  *     reader see a posting twice. The old dirs become garbage for
  *     [[StreamBm25.vacuum]]-style reclamation, not a correctness
  *     hazard.
  *
  * Commit = write `m-<gen>.tmp`, then an atomic `rename` to `m-<gen>`
  * (single-writer per index — the structured-streaming driver — so gens
  * never race). Readers pick the max gen. A missing manifest dir means
  * a legacy (pre-manifest) index: callers fall back to the directory
  * listing, so existing artifacts keep serving.
  */
object Manifest {

  private def mdir(root: String) = new Path(s"$root/manifest")

  private def fsOf(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def gens(fs: FileSystem, root: String): Seq[(Int, Path)] = {
    val d = mdir(root)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath)
      .filter(_.getName.matches("m-\\d{8}"))
      .map(p => (p.getName.drop(2).toInt, p))
      .sortBy(_._1)
  }

  /** Latest committed live-segment set; None = legacy index (no
    * manifest was ever committed) → caller uses the directory listing. */
  def read(s: SparkSession, root: String): Option[Set[Int]] =
    readAt(s, root, None)

  /** The live set AT a generation — TIME TRAVEL over the maintained
    * index (the Iceberg/Delta snapshot-read idea on this layout): every
    * commit is a numbered immutable file and segments are immutable, so
    * a reader pinned to gen G serves exactly the index as of that
    * commit, bit-stable, regardless of later appends/compactions — for
    * as long as G's segments haven't been reclaimed ([[StreamBm25
    * .vacuum]] collapses history to the latest gen; until someone runs
    * it, all history is readable). `gen = None` → latest. Throws on a
    * missing generation (a pinned reader must fail loudly, not silently
    * serve a different snapshot). */
  def readAt(s: SparkSession, root: String, gen: Option[Int])
      : Option[Set[Int]] = {
    val fs = fsOf(s, root)
    val all = gens(fs, root)
    val pick = gen match {
      case None => all.lastOption
      case Some(g) =>
        Some(all.find(_._1 == g).getOrElse(throw new IllegalArgumentException(
          s"no manifest generation $g at $root (have ${all.map(_._1)})")))
    }
    pick.map { case (_, p) =>
      val in = fs.open(p)
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (txt.isEmpty) Set.empty[Int]
        else txt.split(",").map(_.trim.toInt).toSet
      } finally in.close()
    }
  }

  /** Committed generation numbers, oldest first (empty = legacy). */
  def generations(s: SparkSession, root: String): Seq[Int] =
    gens(fsOf(s, root), root).map(_._1)

  /** Commit a new live set as the next generation (write-tmp + atomic
    * rename). This IS the visibility flip: everything a writer staged
    * before this call becomes readable at once; everything dropped from
    * `live` disappears at once. */
  def commit(s: SparkSession, root: String, live: Set[Int]): Unit = {
    val fs = fsOf(s, root)
    val d = mdir(root)
    if (!fs.exists(d)) fs.mkdirs(d)
    val gen = gens(fs, root).lastOption.map(_._1 + 1).getOrElse(0)
    val tmp = new Path(d, f"m-$gen%08d.tmp")
    val fin = new Path(d, f"m-$gen%08d")
    val out = fs.create(tmp, true)
    try out.write(live.toSeq.sorted.mkString(",").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"manifest commit failed: $tmp -> $fin")
  }
}
