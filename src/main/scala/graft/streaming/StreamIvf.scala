package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** STREAMING maintenance of the dense IVF index — the vector-side member
  * of the streaming-ingest family (st3 exact dedup, st5 near-dup, st6/st7
  * segmented BM25): each micro-batch of arriving embeddings is assigned
  * against a FROZEN coarse quantizer and lands as an immutable on-disk
  * postings partition, completing the symmetry with [[StreamBm25]] — the
  * sparse index streams as df-free segments, the dense index streams as
  * cell-assigned postings under train-once centroids.
  *
  * Lifecycle (the FAISS train-then-add contract,
  * [[graft.ext.Similarity.ivfAppend]]'s scaladoc):
  *
  *   - The FIRST micro-batch trains the coarse quantizer
  *     ([[graft.ext.Similarity.ivfCentroids]], Lloyd-refined) and writes
  *     it once; every later batch reads it back and only ASSIGNS —
  *     centroid bytes on disk never change after batch 0
  *     (StreamIvfSpec pins this), so concurrent probes always score
  *     against the same cell geometry.
  *   - Each batch's postings append as their own `batch_id=` parquet
  *     partition: a partition ADD, never a rewrite — existing postings
  *     are never read, re-assigned, or rewritten, so ingest cost is
  *     bounded by batch size and a reader mid-append sees only whole
  *     batches.
  *   - At-least-once sources re-deliver: the first-seen guard drops
  *     batch ids already indexed (the [[StreamBm25.appendBatch]] /
  *     bm25SegmentAppend guard; at scale the membership probe is
  *     per-partition id-range/bloom metadata, not the postings scan used
  *     at test scale). A fully re-delivered batch appends nothing — not
  *     even an empty partition.
  *
  * Training on the first batch rather than the full stream is the
  * production reality (the stream has no end to train on); the cost is
  * quantizer drift as the ingest distribution shifts, which is exactly
  * what [[graft.ext.Similarity.ivfDriftReport]] meters and
  * [[graft.ext.Similarity.ivfRetrainNeeded]] turns into the re-train
  * trigger — the dense-index analogue of [[StreamBm25
  * .compactionCandidates]]'s metadata-only merge decision.
  *
  * Serve correctness is probe-depth-independent of training quality:
  * st8_bm25_stream's driver query probes the streamed index at FULL
  * depth (nProbe = nCells), which is exact top-k whatever the centroids
  * learned — the streamed ≡ scratch proof runs against a DuckDB
  * brute-force oracle on real data.
  */
object StreamIvf {

  private def centroidsDir(dir: String) = s"$dir/centroids"
  private def postingsDir(dir: String) = s"$dir/postings"
  private def tombDir(dir: String) = s"$dir/tombstones"

  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Split a live set into (postings-partition ids, tombstone ids) —
    * the manifest-declared family ([[Manifest.Live]]), with the
    * conservative directory-probe fallback for pre-family generations
    * (the StreamBm25.families discipline: ambiguity resolves to DATA). */
  private def families(s: SparkSession, dir: String,
                       live: Manifest.Live): (Set[Int], Set[Int]) = {
    val fs = fsOf(s, dir)
    val legacyTombs = live.data.filter { id =>
      id < 0 &&
        Manifest.hasDataFiles(fs, new org.apache.hadoop.fs.Path(
          s"${tombDir(dir)}/ts_id=$id")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(
          s"${postingsDir(dir)}/batch_id=$id"))
    }
    (live.data -- legacyTombs, live.tombs ++ legacyTombs)
  }

  /** The union of live tombstoned vector ids (fixed column name `key`);
    * None when nothing is deleted. */
  private def tombstoneKeys(s: SparkSession, dir: String,
                            tombIds: Set[Int]): Option[DataFrame] =
    if (tombIds.isEmpty) None
    else Some(s.read.option("basePath", tombDir(dir))
      .parquet(tombIds.toSeq.sorted
        .map(id => s"${tombDir(dir)}/ts_id=$id"): _*)
      .select("key"))

  /** Every id EVER written across both partition families — the
    * listing-based ledger [[Manifest.claimNegId]] seeds from. */
  private def everUsedIds(s: SparkSession, dir: String): Set[Int] = {
    val fs = fsOf(s, dir)
    def list(d: String, prefix: String): Set[Int] = {
      val p = new org.apache.hadoop.fs.Path(d)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toInt).toSet
    }
    list(postingsDir(dir), "batch_id=") ++ list(tombDir(dir), "ts_id=")
  }

  /** `foreachBatch` sink body: micro-batch `batchId` → one immutable
    * on-disk postings partition (`batch_id=<batchId>`), training the
    * frozen quantizer iff this is the first non-empty batch. Docs
    * already indexed are dropped (first-seen, re-delivery-safe). */
  def appendBatch(dir: String, batch: DataFrame, batchId: Long,
                  idCol: String, vecCol: String, nCells: Int,
                  nAssign: Int = 2, refineIters: Int = 2,
                  hierAssignFrom: Int = 512): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // birth commit + same-batchId crash-retry wipe + ONE manifest read
    // shared by guard and commit ([[Manifest.enterBatch]] — the
    // protocol all three sinks share)
    val (gen, manifest, referenced) = Manifest.enterBatch(spark, dir,
      batchId.toInt, postingsDir(dir),
      Seq(s"${postingsDir(dir)}/batch_id=${batchId.toInt}",
        s"${FpState.fpDir(dir)}/batch_id=${batchId.toInt}"))
    // first-seen guard counts TOMBSTONED ids as seen (the StreamBm25
    // discipline): load() masks them out of the postings, so without
    // this leg a re-crawl of a taken-down vector would re-index rows
    // the mask makes unservable
    val tombstoned = tombstoneKeys(spark, dir,
      families(spark, dir, manifest.getOrElse(Manifest.Live.empty))._2)
    val guarded = tombstoned match {
      case Some(deleted) =>
        batch.join(deleted.select(col("key").as(idCol)),
          Seq(idCol), "left_anti")
      case None => batch
    }
    val fresh = (load(spark, dir, idCol, vecCol) match {
      case Some(idx) =>
        guarded.join(idx.postings.select(col(idCol)).distinct(),
          Seq(idCol), "left_anti")
      case None => guarded
    }).select(col(idCol), col(vecCol)).persist()
    try {
      // one materialized snapshot drives the (possible) train AND the
      // assignment — the StreamBm25 listing-consistency discipline: no
      // later action can see a file listing containing this batch's own
      // postings
      if (fresh.count() == 0) return
      // COMMITTED partitions are immutable — including ones no longer
      // live (older pinned generations still serve them): a batch id
      // EVER referenced by a manifest generation, carrying unindexed
      // vectors, means a RESET checkpoint against an existing dir —
      // appending would put rows into a committed partition (visible
      // without a flip, leaking into pinned snapshots). A true
      // re-delivery carries only indexed ids and returned above.
      if (referenced.contains(batchId.toInt))
        throw new IllegalStateException(
          s"batch $batchId was already committed in $dir (live or in " +
            "time-travel history) but this delivery carries unindexed " +
            "vectors — a restarted stream against an existing index " +
            "needs batch ids above every id ever used (or a new dir)")
      val cPath = new org.apache.hadoop.fs.Path(centroidsDir(dir))
      // a centroid dir without its _SUCCESS job-commit marker is a
      // crashed training write — wipe and retrain (the quantizer is
      // only frozen once COMPLETELY written)
      if (fs.exists(cPath) && !fs.exists(
          new org.apache.hadoop.fs.Path(cPath, "_SUCCESS")))
        fs.delete(cPath, true)
      if (!fs.exists(cPath)) {
        // train ONCE, on the first batch (FAISS train-then-add); the
        // write is the freeze — no later batch ever touches this dir
        Similarity.ivfCentroids(fresh, idCol, vecCol, nCells,
            refineIters, hierAssignFrom)
          .coalesce(1) // nCells rows — one footer, page-cached reload
          .write.mode("errorifexists").parquet(centroidsDir(dir))
      }
      val centroids = spark.read.parquet(centroidsDir(dir))
      val assigned =
        if (nCells >= hierAssignFrom)
          Similarity.assignToHier(fresh, centroids, idCol, vecCol, nAssign)
        else Similarity.assignTo(fresh, centroids, idCol, vecCol, nAssign)
      assigned
        .select(col(idCol), col(vecCol), col("ivf_cell"))
        .write.mode("overwrite") // direct partition write — no shared-
        .parquet(                // root _temporary staging to race on
          s"${postingsDir(dir)}/batch_id=${batchId.toInt}")
      // maintained fingerprint partial ([[fingerprintState]]): the
      // served VECTOR-ID set this batch adds, hashed from the
      // just-written partition (nAssign > 1 duplicates rows per id —
      // the identity is per id, so distinct); rides the same flip
      FpState.write(dir, batchId.toInt, FpState.partial(
        spark.read.parquet(
            s"${postingsDir(dir)}/batch_id=${batchId.toInt}")
          .select(col(idCol)).distinct(), Seq(idCol), sign = 1))
      // COMMIT (CAS on the generation read at entry): the batch's
      // postings become visible atomically; a concurrent maintenance
      // commit throws and the engine's batch retry re-runs fresh
      // legacy adoption baseline from partition-NAME listing (no data
      // read — the StreamBm25.everUsedIds discipline)
      val live = manifest.getOrElse(Manifest.Live(
        fs.listStatus(new org.apache.hadoop.fs.Path(postingsDir(dir)))
          .map(_.getPath.getName).filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toInt).toSet - batchId.toInt,
        Set.empty))
      Manifest.commitLiveAfter(spark, dir,
        live.copy(data = live.data + batchId.toInt), basedOn = gen)
    } finally fresh.unpersist()
  }

  /** RE-TRAIN — the remedy [[graft.ext.Similarity.ivfRetrainNeeded]]
    * triggers, completing the dense maintenance lifecycle the way
    * [[StreamBm25.compactSet]] completes the sparse one (ingest → serve
    * → drift audit → RETRAIN): the live corpus (ids + vectors read from
    * the current postings, first assignment per id) trains a fresh
    * quantizer and re-assigns into `newDir` as that index's batch 0.
    *
    * The retrained index is a NEW index dir, and the serving layer's
    * pointer swap is the commit — deliberately: a re-train invalidates
    * every cell id at once (unlike compaction, there is no shared
    * postings layout to stage into), so the only honest atomic unit is
    * the whole index, exactly FAISS's rebuild-and-swap contract. The
    * old dir keeps serving until the swap, then becomes garbage. The
    * ingest stream targets `newDir` afterwards; its first-seen guard
    * sees all retrained ids (StreamIvfSpec: retrained full-depth serve
    * ≡ the old index's ≡ brute force, and the planted drift skew
    * resets).
    *
    * The rebuilt corpus lands as the RESERVED partition
    * `batch_id=`[[RetrainBatchId]] (negative — the same
    * outside-the-engine namespace as [[StreamBm25]]'s merged segments):
    * a fresh stream checkpoint pointed at `newDir` restarts at batchId
    * 0, and if the retrain output had claimed 0, `enterBatch` would see
    * it already live, skip the crash-wipe, and the new batch's rows
    * would append into a COMMITTED partition — visible without a
    * manifest flip and leaking into older pinned snapshots. Streaming
    * engine batch ids are always ≥ 0, so the negative id can never
    * collide. */
  def retrain(s: SparkSession, oldDir: String, newDir: String, nCells: Int,
              nAssign: Int = 2, refineIters: Int = 2,
              hierAssignFrom: Int = 512,
              idCol: String = "vec_id", vecCol: String = "vec"): Unit = {
    val idx = load(s, oldDir, idCol, vecCol).getOrElse(
      throw new IllegalArgumentException(s"no index at $oldDir"))
    val corpus = idx.postings
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)
          .orderBy(col("ivf_cell"))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(vecCol))
    appendBatch(newDir, corpus, batchId = RetrainBatchId, idCol, vecCol,
      nCells, nAssign, refineIters, hierAssignFrom)
  }

  /** Reserved partition id for [[retrain]] output — outside the
    * streaming engine's (≥ 0) batch-id namespace. */
  val RetrainBatchId: Long = -1L

  /** TAKEDOWN deletes on the dense index — the [[StreamBm25.deleteDocs]]
    * pattern for the vector derivative of forgotten content: a deleted
    * document's EMBEDDINGS are as much its content as its postings, so
    * a right-to-be-forgotten cascade must reach this sink too. `ids`
    * become a tombstone partition (`tombstones/ts_id=<claimed negative
    * id>`) committed in the SAME manifest live set as the postings (one
    * commit point — no resurrect window). Effects mirror the sparse
    * sink: the serve masks tombstoned vectors immediately (in EVERY
    * cell they were assigned to — nAssign can be > 1); the ingest guard
    * counts them as seen so a re-crawl stays out; [[compactAll]]
    * physically reclaims and clears the tombstones in one flip; pinned
    * pre-delete generations time-travel until [[vacuum]]. Scoped to
    * currently-served ids (idempotent; empty effective set commits no
    * generation); CAS + staged-cleanup like every maintainer. */
  def deleteVecs(s: SparkSession, dir: String, ids: DataFrame,
                 idCol: String, vecCol: String = "vec"): Unit = {
    // commit-base generation BEFORE the postings snapshot (the
    // StreamBm25.deleteDocs ordering): a concurrent append between the
    // reads fails our CAS instead of slipping its key past the scope
    val st = Manifest.readLiveWithGen(s, dir)
    val idx = load(s, dir, idCol, vecCol).getOrElse(
      throw new IllegalArgumentException(s"no index at $dir"))
    val live = st.map(_._2).getOrElse(Manifest.Live(
      everUsedIds(s, dir), Set.empty))
    val del = ids.select(col(idCol).as("key")).distinct()
      .join(idx.postings.select(col(idCol).as("key")).distinct(),
        Seq("key"), "left_semi")
      .persist()
    try {
      if (del.count() == 0) return // nothing newly deleted: no commit
      val tsId = Manifest.claimNegId(s, dir, everUsedIds(s, dir))
      del.coalesce(1) // takedown-sized, not index-sized
        .write.mode("overwrite").parquet(s"${tombDir(dir)}/ts_id=$tsId")
      // NEGATIVE fingerprint partial: the ids this delete masks out of
      // the serve, XORed and counted out — same flip as the tombstone
      FpState.write(dir, tsId, FpState.partial(
        del.select(col("key").as(idCol)), Seq(idCol), sign = -1))
      try Manifest.commitLiveAfter(s, dir,
        live.copy(tombs = live.tombs + tsId),
        basedOn = st.map(_._1).getOrElse(-1))
      catch {
        case e: java.util.ConcurrentModificationException =>
          fsOf(s, dir).delete(new org.apache.hadoop.fs.Path(
            s"${tombDir(dir)}/ts_id=$tsId"), true)
          FpState.drop(s, dir, tsId)
          throw e
      }
    } finally del.unpersist()
  }

  /** ALLOCATE the next maintainer id (negative namespace, atomically
    * claimed — [[Manifest.claimNegId]] over the listing ledger). */
  def nextCompactId(s: SparkSession, dir: String): Int =
    Manifest.claimNegId(s, dir, everUsedIds(s, dir))

  /** Fold every live postings partition into ONE base partition
    * (`into` — a fresh claimed NEGATIVE id) holding only SURVIVING
    * rows: the physical reclaim of [[deleteVecs]]' tombstones, which
    * drop out of the live set in the same atomic flip. Cell
    * assignments are preserved verbatim (the quantizer is frozen —
    * this is a rewrite, not a retrain), so the serve is bit-invariant
    * when nothing was deleted. Folded partitions stay as time-travel
    * history until [[vacuum]]. */
  def compactAll(s: SparkSession, dir: String, into: Int,
                 idCol: String, vecCol: String): Unit = {
    require(into < 0, s"compacted ids are negative (got into=$into); " +
      "non-negative ids belong to the streaming engine's batch counter")
    val everUsed = everUsedIds(s, dir)
    require(!everUsed.contains(into),
      s"into=$into was already used (ever-written ids: $everUsed)")
    val st = Manifest.readLiveWithGen(s, dir)
    val idx = load(s, dir, idCol, vecCol).getOrElse(
      throw new IllegalArgumentException(s"no index at $dir"))
    idx.postings.select(col(idCol), col(vecCol), col("ivf_cell"))
      .write.mode("overwrite")
      .parquet(s"${postingsDir(dir)}/batch_id=$into")
    // fresh EXACT fingerprint base from the merged survivors — absorbs
    // every prior partial in the same flip that absorbs the tombstones,
    // and mints coverage for pre-upgrade dirs (the migration path)
    FpState.write(dir, into, FpState.partial(
      s.read.parquet(s"${postingsDir(dir)}/batch_id=$into")
        .select(col(idCol)).distinct(), Seq(idCol), sign = 1))
    try Manifest.commitLiveAfter(s, dir,
      Manifest.Live(Set(into), Set.empty),
      basedOn = st.map(_._1).getOrElse(-1))
    catch {
      case e: java.util.ConcurrentModificationException =>
        fsOf(s, dir).delete(new org.apache.hadoop.fs.Path(
          s"${postingsDir(dir)}/batch_id=$into"), true)
        FpState.drop(s, dir, into)
        throw e
    }
  }

  /** Reclaim time-travel history ([[Manifest.vacuumHistory]]): postings
    * and tombstone partitions no generation serves anymore are deleted
    * — after [[deleteVecs]] + [[compactAll]], the step that removes the
    * last readable copy of the taken-down vectors. */
  def vacuum(s: SparkSession, dir: String,
             includeOrphans: Boolean = false,
             retainMillis: Option[Long] = None): Unit =
    Manifest.vacuumHistory(s, dir, vacuumFamilies(dir),
      includeOrphans = includeOrphans, retainMillis = retainMillis)

  private def vacuumFamilies(dir: String): Seq[(String, String)] = Seq(
    postingsDir(dir) -> "batch_id=", tombDir(dir) -> "ts_id=",
    FpState.fpDir(dir) -> "batch_id=")

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

  /** The maintained index as written so far; None before the first
    * batch. Serve with [[graft.ext.Similarity.probeIvf]]; audit with
    * [[graft.ext.Similarity.ivfDriftReport]]. The `batch_id` partition
    * column rides along in the postings (probeIvf selects only the
    * columns it scores), so provenance of every posting survives into
    * any serve-side audit. */
  def load(s: SparkSession, dir: String, idCol: String, vecCol: String)
      : Option[Similarity.IvfIndex] =
    loadAt(s, dir, idCol, vecCol, asOfGen = None)

  /** The MAINTAINED index fingerprint — "is this the vector snapshot
    * X" answered from O(state) metadata ([[FpState]], the st15 pattern
    * on the dense sink): one (n, xor) partial per committed batch, a
    * negative partial per takedown, an exact base at compaction. The
    * identity bound is the served VECTOR-ID set (+ count) — equal by
    * construction to `corpusFingerprint(load(dir).postings.select(id)
    * .distinct, Seq(id), Seq())`. None when some live partition
    * predates the fingerprint state; [[compactAll]] migrates. */
  def fingerprintState(s: SparkSession, dir: String): Option[DataFrame] =
    Manifest.readLiveWithGen(s, dir).map(_._2).flatMap { live =>
      val (dataIds, tombIds) = families(s, dir, live)
      val fs = fsOf(s, dir)
      def has(p: String) =
        Manifest.hasDataFiles(fs, new org.apache.hadoop.fs.Path(p))
      FpState.serve(s, dir, dataIds ++ tombIds, uncovered = id =>
        (dataIds.contains(id) &&
          has(s"${postingsDir(dir)}/batch_id=$id")) ||
        (tombIds.contains(id) && has(s"${tombDir(dir)}/ts_id=$id")))
    }

  /** TIME-TRAVEL read ([[Manifest.readAt]]): the index exactly as of a
    * committed manifest generation — postings partitions are immutable
    * and the quantizer frozen, so any un-vacuumed snapshot serves
    * bit-stable. None = latest. */
  def loadAt(s: SparkSession, dir: String, idCol: String, vecCol: String,
             asOfGen: Option[Int]): Option[Similarity.IvfIndex] = {
    val p = new org.apache.hadoop.fs.Path(postingsDir(dir))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // the index exists only once the quantizer completed (a batch-0
    // crash can leave staged postings without one)
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        centroidsDir(dir), "_SUCCESS"))) None
    else Manifest.readLiveAt(s, dir, asOfGen) match {
      case Some(live0) =>
        // SNAPSHOT-ISOLATED read (the StreamBm25.loadAt discipline):
        // the file list comes from the manifest — exactly the live
        // partitions' paths, which are immutable — never a directory
        // listing that would enumerate an in-flight append's staged
        // partition (whose crash-retry wipe could vanish files
        // mid-scan and kill a concurrent probe).
        val (dataIds, tombIds) = families(s, dir, live0)
        if (dataIds.isEmpty) None // born (birth commit) but no batch yet
        else {
          val paths = dataIds.toSeq.sorted
            .map(id => s"${postingsDir(dir)}/batch_id=$id")
          val postings0 = s.read.option("basePath", postingsDir(dir))
            .parquet(paths: _*)
            .withColumn("batch_id", col("batch_id").cast("int"))
          // takedown mask ([[deleteVecs]] — Lucene liveDocs): a
          // tombstoned vector never scores, in ANY of its assigned
          // cells; physical reclaim happens at [[compactAll]]
          val postings = tombstoneKeys(s, dir, tombIds) match {
            case Some(deleted) =>
              postings0.join(deleted.select(col("key").as(idCol)),
                Seq(idCol), "left_anti")
            case None => postings0
          }
          Some(Similarity.IvfIndex(
            centroids = s.read.parquet(centroidsDir(dir)),
            postings = postings,
            idCol = idCol, vecCol = vecCol))
        }
      case None =>
        // legacy (pre-manifest) dir: single-writer — the listing IS
        // the live set; an existing-but-empty postings dir means
        // "index not born yet", not an unreadable-parquet error
        if (!Manifest.hasDataFiles(fs, p)) None
        else Some(Similarity.IvfIndex(
          centroids = s.read.parquet(centroidsDir(dir)),
          postings = s.read.parquet(postingsDir(dir))
            .withColumn("batch_id", col("batch_id").cast("int")),
          idCol = idCol, vecCol = vecCol))
    }
  }
}
