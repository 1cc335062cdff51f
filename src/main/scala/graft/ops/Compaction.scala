package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file COMPACTION for a landed parquet table — the housekeeping a
  * 100 TB ingest loop cannot skip: every incremental append (x36/x45
  * batches, streaming sinks, dynamic-partition backfills) lands a few
  * files, and a year of appends turns the table into millions of
  * KB-sized files whose per-file open/footer cost dwarfs the data scan.
  *
  * `compactPartition` rewrites ONE partition directory (the incremental
  * unit — compact what churned, leave cold partitions byte-identical) to
  * `targetFiles` files via a round-robin repartition of that partition's
  * rows only. Write-then-swap: the rewrite lands in a sibling temp dir
  * and replaces the partition atomically-enough for a single-writer
  * maintenance job (the cluster story is a transactional table format;
  * this is the format-free core move).
  *
  * Scale shape: cost is one read+shuffle+write of the ONE partition
  * being compacted — never the table; partitions compact independently
  * (a maintenance job fans them out). Reference: the reference project
  * has no storage layer at all (notebooks re-download via yfinance —
  * `stock_arbitrage.ipynb` cell 1); this is part of the landed-table
  * contract a persistent engine adds. */
object Compaction {

  /** File count of one partition directory (data files only). */
  def dataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"not a directory: $dir")
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq
  }

  /** Rewrite `tableDir/partition` into `targetFiles` files. Returns
    * (filesBefore, filesAfter). */
  def compactPartition(spark: SparkSession, tableDir: String,
                       partition: String, targetFiles: Int): (Int, Int) = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val dir = s"$tableDir/$partition"
    val before = dataFiles(dir).size
    val tmp = s"$tableDir/.compact_tmp_${partition.replace('/', '_')}"
    spark.read.parquet(dir)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    // swap, NEW FILES FIRST: the compacted part files carry fresh UUID
    // names, so renaming them in cannot collide with the originals —
    // and a crash mid-swap leaves the partition with originals plus
    // some/all new files (duplicated rows a re-run resolves by
    // re-compacting), never with data missing. Deleting the originals
    // first would maximize the torn window: any rename failure after
    // the delete loses rows with no rollback path.
    val target = new java.io.File(dir)
    val originals = dataFiles(dir)
    new java.io.File(tmp).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .foreach { f =>
        val ok = f.renameTo(new java.io.File(target, f.getName))
        require(ok, s"rename failed for ${f.getName}")
      }
    originals.foreach(f => new java.io.File(f).delete())
    deleteRecursively(new java.io.File(tmp))
    (before, dataFiles(dir).size)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
