package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** STREAMING maintenance of the CONTAINMENT index — the maintained-sink
  * form of the [[graft.ext.Dedup.containmentAgainst]] artifacts (the
  * r11 close's named candidate, and the last derivative outside the
  * takedown cascade): the shingle-SET table (each body tokenized
  * exactly once, at ingest), the EXPLODED postings table (ngb-bucketed,
  * so an increment's candidate generation is a partition-pruned flat
  * read — never a re-explode of every stored set), and the shingle df
  * table, all under the shared [[Manifest]] CAS protocol.
  *
  * THE STORAGE SHAPE is a hybrid of the two proven disciplines:
  *
  *   - sets + postings are PER-DOC rows → the tombstone-mask answer
  *     (x57): a delete records the ids (the persistent `delids` aux
  *     family) and every serve anti-joins them; [[compact]] folds the
  *     survivors into a fresh base, after which no live partition holds
  *     the deleted rows.
  *   - df rows are SUMS → the LSM negative-delta answer (st13): the
  *     delete appends `-1` per distinct shingle of the deleted docs,
  *     the serve's keyed sum nets it out immediately, the fold absorbs
  *     it physically. Unlike the ngram-df sink the negative delta needs
  *     NO bodies — the stored sets ARE the contribution record — so the
  *     containment leg of a takedown cascade is self-sufficient and
  *     runs with the id-keyed derivatives, not before the corpus.
  *
  * REPLAY SAFETY mirrors [[StreamNgramDf]]: a `seenids` partition rides
  * every delta, arriving docs anti-join the committed ids INSIDE the
  * sink, and a re-delivered batch contributes nothing. The guard is
  * id-based and never forgets, so a re-crawl of a deleted doc stays out
  * (the x58 blocker semantics) — and batch ids stay disjoint from index
  * ids, the [[graft.ext.Dedup.containmentAgainst]] contract.
  *
  * Serve = [[serve]]: containment of a probe batch against the
  * maintained index, O(batch) per increment (left-merged combined df,
  * bucket-pruned postings read, stored sets for the exact recheck).
  */
object StreamContainment {

  private def setsDir(dir: String) = s"$dir/sets"
  private def postDir(dir: String) = s"$dir/post"
  private def dfDir(dir: String) = s"$dir/dfparts"
  private def idsDir(dir: String) = s"$dir/seenids"
  private def delDir(dir: String) = s"$dir/delids"

  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Every id EVER written, from partition-DIR names (the shared
    * maintainer-side listing discipline — names race nothing). */
  private def everUsedIds(s: SparkSession, dir: String): Set[Int] = {
    val fs = fsOf(s, dir)
    Seq(setsDir(dir) -> "batch_id=", postDir(dir) -> "batch_id=",
      dfDir(dir) -> "batch_id=", idsDir(dir) -> "batch_id=",
      delDir(dir) -> "del_id=").flatMap { case (d, prefix) =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toInt)
    }.toSet
  }

  /** The union of deleted doc ids (the `aux` family — survives every
    * fold, keeping re-deletes idempotent forever). */
  private def deletedIds(s: SparkSession, dir: String,
                         aux: Set[Int]): Option[DataFrame] = {
    val fs = fsOf(s, dir)
    val present = aux.toSeq.sorted
      .map(id => s"${delDir(dir)}/del_id=$id")
      .filter(p => Manifest.hasDataFiles(fs,
        new org.apache.hadoop.fs.Path(p)))
    if (present.isEmpty) None
    else Some(s.read.option("basePath", delDir(dir))
      .parquet(present: _*).select("id"))
  }

  /** `foreachBatch` sink body: one micro-batch folds into the three
    * maintained tables. Each body is shingled EXACTLY ONCE, here —
    * everything downstream (increments, full analytics, takedown's
    * negative df) reads the stored derivation. Four staged partitions,
    * one atomic flip. */
  def appendBatch(dir: String, docs: DataFrame, batchId: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  n: Int = 5): Unit = {
    require(batchId >= 0, s"engine batch ids are non-negative (got " +
      s"$batchId); negative ids are the compaction namespace")
    val spark = docs.sparkSession
    val bid = batchId.toInt
    val (gen, manifest, referenced) = Manifest.enterBatch(spark, dir,
      bid, setsDir(dir), Seq(
        s"${setsDir(dir)}/batch_id=$bid", s"${postDir(dir)}/batch_id=$bid",
        s"${dfDir(dir)}/batch_id=$bid", s"${idsDir(dir)}/batch_id=$bid"))
    val fresh0 = loadSeenIds(spark, dir) match {
      case Some(seen) =>
        docs.join(seen.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      case None => docs
    }
    val fresh = fresh0.dropDuplicates(idCol).persist()
    try {
      if (fresh.count() == 0) return // full replay: no delta, no commit
      if (referenced.contains(bid))
        throw new IllegalStateException(
          s"batch $batchId was already committed in $dir (live or in " +
            "time-travel history) but this delivery carries new docs — " +
            "a restarted stream against existing state needs batch ids " +
            "above every id ever used (or a new dir)")
      val sets = Dedup.shingleSets(fresh, idCol, textCol, n).persist()
      sets.write.mode("overwrite")
        .parquet(s"${setsDir(dir)}/batch_id=$bid")
      Dedup.postingsOf(sets).write.mode("overwrite").partitionBy("ngb")
        .parquet(s"${postDir(dir)}/batch_id=$bid")
      // df delta from the just-written postings (one columnar read —
      // never a second tokenize)
      spark.read.parquet(s"${postDir(dir)}/batch_id=$bid")
        .groupBy("ng").agg(count(lit(1)).as("ndocs"))
        .write.mode("overwrite").parquet(s"${dfDir(dir)}/batch_id=$bid")
      // the seen guard records EVERY fresh id, including docs too short
      // to shingle (< n tokens): they contributed nothing, and a
      // re-delivery must still drop them
      fresh.select(col(idCol).as("id"))
        .write.mode("overwrite").parquet(s"${idsDir(dir)}/batch_id=$bid")
      sets.unpersist()
      val live = manifest.getOrElse(Manifest.Live(
        everUsedIds(spark, dir) - bid, Set.empty))
      Manifest.commitLiveAfter(spark, dir,
        live.copy(data = live.data + bid), basedOn = gen)
    } finally fresh.unpersist()
  }

  /** TAKEDOWN deletes — ids only, no bodies: the per-doc tables (sets,
    * postings) get a persistent id mask (`delids`, the aux family —
    * every serve anti-joins it, [[compact]] absorbs it physically), and
    * the df table gets a NEGATIVE delta derived from the deleted docs'
    * STORED sets — the contribution record is the index itself, so
    * this sink never needs the corpus during a cascade. Scoped to
    * seen-minus-deleted (a re-delete subtracts nothing); atomic: the
    * negative delta and the delids record commit in ONE flip. */
  def deleteDocs(s: SparkSession, dir: String, ids: DataFrame): Unit = {
    val st = Manifest.readLiveWithGen(s, dir)
    val live = st.map(_._2).getOrElse(throw new IllegalArgumentException(
      s"no manifest at $dir — nothing committed to delete from"))
    val seen = loadSeenIds(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no index state at $dir"))
    val keyCol = ids.columns.head
    val scoped0 = ids.select(col(keyCol).as("id")).dropDuplicates("id")
      .join(seen, Seq("id"), "left_semi")
    val scoped = (deletedIds(s, dir, live.aux) match {
      case Some(del) => scoped0.join(del, Seq("id"), "left_anti")
      case None => scoped0
    }).persist()
    try {
      if (scoped.count() == 0) return // re-deletes/unknown ids: no commit
      val negId = Manifest.claimNegId(s, dir, everUsedIds(s, dir))
      val delId = Manifest.claimNegId(s, dir, everUsedIds(s, dir))
      // negative df from the stored sets of exactly the scoped docs —
      // a takedown-sized semi-join against the served set table
      loadSets(s, dir).getOrElse(
          throw new IllegalStateException(s"no set state at $dir"))
        .join(scoped.select(col("id").as("__cid")), Seq("__cid"),
          "left_semi")
        .select(col("__cid"), explode(col("__sh")).as("ng"))
        .groupBy("ng").agg((-count(lit(1))).as("ndocs"))
        .write.mode("overwrite")
        .parquet(s"${dfDir(dir)}/batch_id=$negId")
      scoped.coalesce(1) // takedown-sized
        .write.mode("overwrite").parquet(s"${delDir(dir)}/del_id=$delId")
      try Manifest.commitLiveAfter(s, dir,
        live.copy(data = live.data + negId, aux = live.aux + delId),
        basedOn = st.map(_._1).getOrElse(-1))
      catch {
        case e: java.util.ConcurrentModificationException =>
          val fs = fsOf(s, dir)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"${dfDir(dir)}/batch_id=$negId"), true)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"${delDir(dir)}/del_id=$delId"), true)
          throw e
      }
    } finally scoped.unpersist()
  }

  /** ALLOCATE the next maintainer id (negative namespace). */
  def nextCompactId(s: SparkSession, dir: String): Int =
    Manifest.claimNegId(s, dir, everUsedIds(s, dir))

  /** Fold every live partition into ONE merged base per table: the
    * survivor sets/postings (masks absorbed — no live partition holds a
    * deleted doc's rows afterwards), the netted df (negative deltas
    * absorbed; zero-sum shingles drop), and the seen ids. The aux
    * delids records survive the fold — re-deletes stay idempotent. */
  def compact(s: SparkSession, dir: String, into: Int): Unit = {
    require(into < 0, s"merged ids are negative (got into=$into); " +
      "non-negative ids belong to the streaming engine's batch counter")
    val everUsed = everUsedIds(s, dir)
    require(!everUsed.contains(into),
      s"into=$into was already used (ever-written ids: $everUsed)")
    val st = Manifest.readLiveWithGen(s, dir)
    val sets = loadSets(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no set state at $dir"))
    val df = loadDf(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no df state at $dir"))
    val ids = loadSeenIds(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no seen-ids state at $dir"))
    sets.write.mode("overwrite").parquet(s"${setsDir(dir)}/batch_id=$into")
    // postings re-derived from the survivor sets (cheaper than a
    // masked read of every old postings partition, and provably
    // consistent with the merged set table)
    Dedup.postingsOf(s.read.parquet(s"${setsDir(dir)}/batch_id=$into"))
      .write.mode("overwrite").partitionBy("ngb")
      .parquet(s"${postDir(dir)}/batch_id=$into")
    df.write.mode("overwrite").parquet(s"${dfDir(dir)}/batch_id=$into")
    ids.write.mode("overwrite").parquet(s"${idsDir(dir)}/batch_id=$into")
    try Manifest.commitLiveAfter(s, dir,
      Manifest.Live(Set(into), Set.empty,
        st.map(_._2.aux).getOrElse(Set.empty)),
      basedOn = st.map(_._1).getOrElse(-1))
    catch {
      case e: java.util.ConcurrentModificationException =>
        val fs = fsOf(s, dir)
        Seq(setsDir(dir), postDir(dir), dfDir(dir), idsDir(dir))
          .foreach(d => fs.delete(
            new org.apache.hadoop.fs.Path(s"$d/batch_id=$into"), true))
        throw e
    }
  }

  /** Reclaim time-travel history; the merged base survives, including
    * the compacted seen-ids table (the replay guard keeps holding). */
  def vacuum(s: SparkSession, dir: String,
             includeOrphans: Boolean = false,
             retainMillis: Option[Long] = None): Unit =
    Manifest.vacuumHistory(s, dir, vacuumFamilies(dir),
      includeOrphans = includeOrphans, retainMillis = retainMillis)

  private def vacuumFamilies(dir: String): Seq[(String, String)] = Seq(
    setsDir(dir) -> "batch_id=", postDir(dir) -> "batch_id=",
    dfDir(dir) -> "batch_id=", idsDir(dir) -> "batch_id=",
    delDir(dir) -> "del_id=")

  /** DRY RUN of [[vacuum]] ([[Manifest.vacuumPlan]] on this layout). */
  def vacuumPlan(s: SparkSession, dir: String,
                 retainMillis: Option[Long] = None)
      : Option[(Long, Long, Long, Long)] =
    Manifest.vacuumPlan(s, dir, vacuumFamilies(dir), retainMillis)

  /** [[vacuumPlan]] with the bytes a vacuum would give back
    * ([[Manifest.vacuumPlanBytes]] on this layout — ledgered sizes,
    * one listing per partition per lifetime). */
  def vacuumPlanBytes(s: SparkSession, dir: String,
                      retainMillis: Option[Long] = None)
      : Option[(Long, Long, Long, Long, Long, Long)] =
    Manifest.vacuumPlanBytes(s, dir, vacuumFamilies(dir), retainMillis)

  /** The served shingle-set table (\_\_cid, \_\_sh), deleted docs
    * masked; None before the first batch. */
  def loadSets(s: SparkSession, dir: String): Option[DataFrame] =
    loadSetsAt(s, dir, asOfGen = None)

  /** TIME-TRAVEL read of the set table as of a committed generation. */
  def loadSetsAt(s: SparkSession, dir: String, asOfGen: Option[Int])
      : Option[DataFrame] =
    livePaths(s, dir, setsDir(dir), asOfGen).map { case (paths, aux) =>
      val raw = s.read.option("basePath", setsDir(dir)).parquet(paths: _*)
        .select("__cid", "__sh")
      deletedIds(s, dir, aux) match {
        case Some(del) => raw.join(
          broadcast(del.select(col("id").as("__cid"))), Seq("__cid"),
          "left_anti")
        case None => raw
      }
    }

  /** The served exploded postings (\_\_cid, ng, ngb), deleted docs
    * masked — feed to [[graft.ext.Dedup.containmentAgainst]] as
    * `indexPostings`; None before the first batch. */
  def loadPostings(s: SparkSession, dir: String): Option[DataFrame] =
    livePaths(s, dir, postDir(dir), asOfGen = None).map { case (paths, aux) =>
      val raw = s.read.option("basePath", postDir(dir)).parquet(paths: _*)
        .select("__cid", "ng", "ngb")
      deletedIds(s, dir, aux) match {
        case Some(del) => raw.join(
          broadcast(del.select(col("id").as("__cid"))), Seq("__cid"),
          "left_anti")
        case None => raw
      }
    }

  /** The served (ng, ndocs) df — keyed sum over live deltas, negative
    * takedown deltas netted, zero-sum shingles dropped. */
  def loadDf(s: SparkSession, dir: String): Option[DataFrame] =
    livePaths(s, dir, dfDir(dir), asOfGen = None).map { case (paths, _) =>
      s.read.option("basePath", dfDir(dir)).parquet(paths: _*)
        .groupBy("ng").agg(sum("ndocs").as("ndocs"))
        .filter(col("ndocs") > 0)
    }

  /** Ids whose rows the index still serves (seen minus deleted) — the
    * takedown cascade's loud-failure view. */
  def countedIds(s: SparkSession, dir: String): Option[DataFrame] =
    loadSeenIds(s, dir).map { seen =>
      Manifest.readLiveWithGen(s, dir).map(_._2)
        .flatMap(l => deletedIds(s, dir, l.aux)) match {
        case Some(del) => seen.join(del, Seq("id"), "left_anti")
        case None => seen
      }
    }

  /** The committed doc ids (the replay guard's view). */
  def loadSeenIds(s: SparkSession, dir: String): Option[DataFrame] =
    livePaths(s, dir, idsDir(dir), asOfGen = None).map { case (paths, _) =>
      s.read.option("basePath", idsDir(dir)).parquet(paths: _*)
        .select("id")
    }

  /** Containment of a probe `batch` against the maintained index — the
    * sink-served form of [[graft.ext.Dedup.containmentAgainst]]:
    * left-merged combined df, bucket-pruned postings read, stored sets
    * for the exact recheck. O(batch) per call. */
  def serve(s: SparkSession, dir: String, batch: DataFrame,
            idCol: String = "doc_id", textCol: String = "text",
            n: Int = 5, maxDf: Int = 20,
            threshold: Double = 0.8): DataFrame = {
    val sets = loadSets(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no containment index at $dir"))
    val df = loadDf(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no df state at $dir"))
    Dedup.containmentAgainst(sets, df, batch, idCol, textCol, n, maxDf,
      threshold, indexPostings = loadPostings(s, dir))
  }

  /** Snapshot-isolated live-partition paths + the generation's aux set
    * (DATA-family ids only read as deltas; aux drives the delete
    * mask). */
  private def livePaths(s: SparkSession, dir: String, sub: String,
                        asOfGen: Option[Int])
      : Option[(Seq[String], Set[Int])] =
    Manifest.readLiveAt(s, dir, asOfGen) match {
      case Some(live) if live.all.nonEmpty =>
        val fs = fsOf(s, dir)
        val present = live.data.toSeq.sorted
          .map(id => s"$sub/batch_id=$id")
          .filter(p => Manifest.hasDataFiles(fs,
            new org.apache.hadoop.fs.Path(p)))
        if (present.isEmpty) None else Some((present, live.aux))
      case _ => None
    }
}
