package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** STREAMING maintenance of the n-gram DOCUMENT-FREQUENCY index — the
  * online form of x55's overlap-score artifact ([[graft.ext.TextOps
  * .ngramDf]]), completing the family banner: every maintained dedup /
  * curation artifact has a streamed member (st3 digests, st5
  * signatures, st6/st7 sparse postings, st8 dense index, st9 curated
  * corpus, st10 cluster table — and now the overlap index).
  *
  * THE STORAGE SHAPE: a df table is not append-only row-wise — every
  * batch increments `ndocs` for grams it shares with history, and at
  * corpus scale the gram table is NOT metadata-sized (distinct n-grams
  * grow with the corpus — Lee et al. scale), so the st10 rewrite-the-
  * overlay trick doesn't transfer. The right layout is the LSM / tiered
  * discipline already proven on the BM25 term-df segments: each batch
  * appends an immutable (ng, ndocs) DELTA partition for its FRESH docs
  * only, the served index is the keyed SUM over live deltas (one
  * partial-aggregated groupBy — associative, so deltas never reorder),
  * and [[compact]] folds deltas into one merged base partition (the
  * negative-id namespace) when the live-partition count warrants it.
  *
  * REPLAY SAFETY is structural, not contractual (the r9→r10 upgrade
  * that [[graft.ext.TextOps.ngramDfMergeSafe]] made in batch form): a
  * `seenids/batch_id=N` partition rides next to every delta, arriving
  * docs anti-join the committed ids INSIDE the sink, and a re-delivered
  * batch contributes nothing — no delta, no generation. The guard data
  * is one long per committed doc (the st3 digest-index shape).
  *
  * Crash/concurrency contract = the shared [[Manifest]] protocol:
  * disjoint per-batch staging dirs, one atomic manifest flip, orphan
  * wipe on same-id retry, loud refusal of NEW docs on an ever-committed
  * id, snapshot-isolated reads (live partitions' paths, never a
  * directory listing), time travel via [[loadAt]].
  */
object StreamNgramDf {

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
    Seq(dfDir(dir) -> "batch_id=", idsDir(dir) -> "batch_id=",
      delDir(dir) -> "del_id=").flatMap { case (d, prefix) =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toInt)
    }.toSet
  }

  /** The union of deleted doc ids (the `aux` family — survives every
    * fold, keeping re-deletes idempotent forever); None when nothing
    * was ever deleted. */
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

  /** TAKEDOWN deletes — the LSM answer for an index whose rows are
    * SUMS, not documents (x57's tombstone-mask doesn't transfer: a
    * deleted doc's contribution is spread across every gram it
    * shared): the delete is a NEGATIVE DELTA — `ngramDf` of the deleted
    * docs with `ndocs` negated, appended as one more immutable delta
    * partition. The serve's keyed sum nets it out immediately (grams
    * netting to 0 drop — bit-equal to an index never containing the
    * docs), and [[compact]]'s fold ABSORBS it physically. Needs the
    * deleted docs' TEXTS: the cascade-order contract — forget the
    * derivatives while the corpus sink ([[StreamCurate]]) still holds
    * the bodies, then forget the bodies.
    *
    * Deleted ids are recorded in a `delids` partition under the
    * manifest's persistent `aux` family: deletes are scoped to
    * seen-minus-deleted (a re-delete of the same id subtracts NOTHING —
    * double-subtraction would corrupt every shared gram's df), and the
    * record survives every fold. The seen-ids guard is deliberately
    * untouched, so a re-crawl of a deleted doc stays out (the x58
    * blocker semantics — this index's guard is id-based). Atomic: the
    * negative delta and the deleted-ids record commit in ONE flip; both
    * staged partitions are reclaimed if the CAS loses. */
  def deleteDocs(s: SparkSession, dir: String, docs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 n: Int = 3): Unit = {
    val st = Manifest.readLiveWithGen(s, dir)
    // no listing fallback here: a manifest-less dir has nothing this
    // sink ever committed (loadSeenIds would throw below anyway), and a
    // listing-derived Live would misfile del_id aux partitions into the
    // data family (r11 second-review #6) — fail loudly instead
    val live = st.map(_._2).getOrElse(throw new IllegalArgumentException(
      s"no manifest at $dir — nothing committed to delete from"))
    val seen = loadSeenIds(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no index state at $dir"))
    // one row per id (caller contract: one body per id) — duplicate
    // rows would subtract a doc's gram contributions TWICE and corrupt
    // every shared gram's df (r11 self-review #4)
    val scoped0 = docs.dropDuplicates(idCol)
      .join(seen.select(col("id").as(idCol)), Seq(idCol), "left_semi")
    val scoped = (deletedIds(s, dir, live.aux) match {
      case Some(del) =>
        scoped0.join(del.select(col("id").as(idCol)), Seq(idCol),
          "left_anti")
      case None => scoped0
    }).persist()
    try {
      if (scoped.count() == 0) return // re-deletes/unknown ids: no commit
      val negId = Manifest.claimNegId(s, dir, everUsedIds(s, dir))
      val delId = Manifest.claimNegId(s, dir, everUsedIds(s, dir))
      TextOps.ngramDf(scoped, idCol, textCol, n)
        .select(col("ng"), (-col("ndocs")).as("ndocs"))
        .write.mode("overwrite")
        .parquet(s"${dfDir(dir)}/batch_id=$negId")
      scoped.select(col(idCol).as("id")).coalesce(1) // takedown-sized
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

  /** `foreachBatch` sink body: one micro-batch of documents folds into
    * the maintained index. Re-delivered doc ids drop against the
    * committed seen-ids partitions; a batch with nothing fresh commits
    * nothing — not even a generation. */
  def appendBatch(dir: String, docs: DataFrame, batchId: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  n: Int = 3): Unit = {
    require(batchId >= 0, s"engine batch ids are non-negative (got " +
      s"$batchId); negative ids are the compaction namespace")
    val spark = docs.sparkSession
    val (gen, manifest, referenced) = Manifest.enterBatch(spark, dir,
      batchId.toInt, dfDir(dir), Seq(
        s"${dfDir(dir)}/batch_id=${batchId.toInt}",
        s"${idsDir(dir)}/batch_id=${batchId.toInt}"))
    val fresh0 = loadSeenIds(spark, dir) match {
      case Some(seen) =>
        docs.join(seen.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      case None => docs
    }
    val fresh = fresh0.persist()
    try {
      if (fresh.count() == 0) return // full replay: no delta, no commit
      if (referenced.contains(batchId.toInt))
        throw new IllegalStateException(
          s"batch $batchId was already committed in $dir (live or in " +
            "time-travel history) but this delivery carries new docs — " +
            "a restarted stream against existing state needs batch ids " +
            "above every id ever used (or a new dir)")
      TextOps.ngramDf(fresh, idCol, textCol, n)
        .write.mode("overwrite")
        .parquet(s"${dfDir(dir)}/batch_id=${batchId.toInt}")
      fresh.select(col(idCol).as("id"))
        .write.mode("overwrite")
        .parquet(s"${idsDir(dir)}/batch_id=${batchId.toInt}")
      val live = manifest.getOrElse(Manifest.Live(
        everUsedIds(spark, dir) - batchId.toInt, Set.empty))
      Manifest.commitLiveAfter(spark, dir,
        live.copy(data = live.data + batchId.toInt), basedOn = gen)
    } finally fresh.unpersist()
  }

  /** ALLOCATE the next maintainer id (negative namespace, atomically
    * claimed over the LISTING-based ledger — [[Manifest.claimNegId]]'s
    * documented seed; the live set alone would miss on-disk non-live
    * partitions). */
  def nextCompactId(s: SparkSession, dir: String): Int =
    Manifest.claimNegId(s, dir, everUsedIds(s, dir))

  /** Fold every live delta into ONE merged base partition (`into` — a
    * fresh negative id, the merged-segment namespace) for both the df
    * table and the seen ids: the tiered-merge step that bounds the
    * serve-time sum's fan-in. Stages, then one atomic flip; folded
    * partitions stay as time-travel history. */
  def compact(s: SparkSession, dir: String, into: Int): Unit = {
    require(into < 0, s"merged ids are negative (got into=$into); " +
      "non-negative ids belong to the streaming engine's batch counter")
    val everUsed = everUsedIds(s, dir)
    require(!everUsed.contains(into),
      s"into=$into was already used (ever-written ids: $everUsed)")
    val st = Manifest.readLiveWithGen(s, dir)
    // load() nets negative takedown deltas and drops zero-sum grams, so
    // the merged base PHYSICALLY forgets deleted contributions
    val df = load(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no df state at $dir"))
    val ids = loadSeenIds(s, dir).getOrElse(
      throw new IllegalArgumentException(s"no seen-ids state at $dir"))
    df.write.mode("overwrite").parquet(s"${dfDir(dir)}/batch_id=$into")
    ids.write.mode("overwrite").parquet(s"${idsDir(dir)}/batch_id=$into")
    // the aux family (deleted-ids records) survives the fold — that is
    // what keeps re-deletes idempotent after physical reclaim
    try Manifest.commitLiveAfter(s, dir,
      Manifest.Live(Set(into), Set.empty,
        st.map(_._2.aux).getOrElse(Set.empty)),
      basedOn = st.map(_._1).getOrElse(-1))
    catch {
      case e: java.util.ConcurrentModificationException =>
        val fs = fsOf(s, dir)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${dfDir(dir)}/batch_id=$into"), true)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${idsDir(dir)}/batch_id=$into"), true)
        throw e
    }
  }

  /** Reclaim time-travel history ([[Manifest.vacuumHistory]] on this
    * layout): delta + seen-ids partitions no generation will serve
    * anymore are deleted and the manifest collapses to the latest
    * commit — typically run after [[compact]]. The merged base (live)
    * partitions survive, INCLUDING the compacted seen-ids table, so the
    * replay guard keeps holding after reclamation. */
  def vacuum(s: SparkSession, dir: String,
             includeOrphans: Boolean = false,
             retainMillis: Option[Long] = None): Unit =
    Manifest.vacuumHistory(s, dir, vacuumFamilies(dir),
      includeOrphans = includeOrphans, retainMillis = retainMillis)

  private def vacuumFamilies(dir: String): Seq[(String, String)] = Seq(
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

  /** The served (ng, ndocs) index — the keyed sum over live delta
    * partitions; None before the first batch. Feed it to [[graft.ext
    * .TextOps.dupScoreAgainst]] exactly like a scratch [[graft.ext
    * .TextOps.ngramDf]] table. */
  def load(s: SparkSession, dir: String): Option[DataFrame] =
    loadAt(s, dir, asOfGen = None)

  /** TIME-TRAVEL read of the df index as of a committed generation.
    * The keyed sum nets [[deleteDocs]]' negative deltas; grams netting
    * to zero DROP — the served table is bit-equal to one over a corpus
    * that never contained the deleted docs. */
  def loadAt(s: SparkSession, dir: String, asOfGen: Option[Int])
      : Option[DataFrame] =
    livePaths(s, dir, dfDir(dir), asOfGen).map { paths =>
      s.read.option("basePath", dfDir(dir)).parquet(paths: _*)
        .groupBy("ng").agg(sum("ndocs").as("ndocs"))
        .filter(col("ndocs") > 0)
    }

  /** Ids whose gram contributions the index still COUNTS (seen minus
    * already-deleted) — the set a takedown cascade must be able to
    * resolve bodies for ([[Takedown.forget]]'s loud-failure guard);
    * None before the first batch. */
  def countedIds(s: SparkSession, dir: String): Option[DataFrame] =
    loadSeenIds(s, dir).map { seen =>
      Manifest.readLiveWithGen(s, dir).map(_._2)
        .flatMap(l => deletedIds(s, dir, l.aux)) match {
        case Some(del) => seen.join(del, Seq("id"), "left_anti")
        case None => seen
      }
    }

  /** The committed doc ids (the replay guard's view); None before the
    * first batch. */
  def loadSeenIds(s: SparkSession, dir: String): Option[DataFrame] =
    livePaths(s, dir, idsDir(dir), asOfGen = None).map { paths =>
      s.read.option("basePath", idsDir(dir)).parquet(paths: _*)
        .select("id")
    }

  /** Snapshot-isolated live-partition paths (the manifest discipline:
    * never a directory listing) — DATA-family ids only: the aux family
    * (deleted-ids records) never reads as a delta. */
  private def livePaths(s: SparkSession, dir: String, sub: String,
                        asOfGen: Option[Int]): Option[Seq[String]] =
    Manifest.readLiveAt(s, dir, asOfGen) match {
      case Some(live) if live.all.nonEmpty =>
        val fs = fsOf(s, dir)
        val present = live.data.toSeq.sorted
          .map(id => s"$sub/batch_id=$id")
          .filter(p => Manifest.hasDataFiles(fs,
            new org.apache.hadoop.fs.Path(p)))
        if (present.isEmpty) None else Some(present)
      case _ => None
    }
}
