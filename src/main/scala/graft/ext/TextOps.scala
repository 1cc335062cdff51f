package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north star): tokenization, quality scoring, language-ID
  * heuristics, fingerprinting, shingling.
  *
  * Everything here is pure Catalyst column expressions (split / transform /
  * filter / aggregate higher-order functions) — fully codegen'd, no UDFs,
  * so a 100 TB `documents` scan stays inside WholeStageCodegen with
  * predicate pushdown intact.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of alternating letter/digit runs —
    * `regexp`-split on boundaries; stays codegen'd. */
  def subwordCount(text: Column): Column =
    size(split(text, "(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|\\s+"))

  /** Share of characters that are not lowercase alphanumerics or space. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))).cast("double") /
      length(text)

  /** Share of tokens found in `stops`. */
  def stopwordRatio(text: Column, stops: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stops))).cast("double") /
      size(tokens(text))

  /** Composite quality score in [0,1]: length saturation + stopword mass +
    * cleanliness (1 - punct ratio). The standard C4/Gopher-style shape. */
  def qualityScore(text: Column, stops: Seq[String]): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.3 +
      stopwordRatio(text, stops) * 0.4 +
      (lit(1.0) - punctRatio(text)) * 0.3

  /** N-gram language-ID heuristic: count marker-token hits per language,
    * argmax with a deterministic tie order (first wins). `markers` maps
    * language code → marker token set. */
  def langIdScore(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scored = markers.map { case (lang, ms) =>
      (lang, size(filter(tokens(text), t => t.isInCollection(ms))))
    }
    scored.tail.foldLeft((scored.head._2, lit(scored.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Content fingerprint: md5 over the sorted distinct token set — detects
    * bag-of-words duplicates irrespective of word order. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Distinct word k-shingles (k consecutive tokens joined by a space) —
    * the unit set for MinHash / Jaccard dedup. Empty when the document has
    * fewer than k tokens.
    *
    * IMPORTANT: `toks` must be a materialized column reference (e.g. via a
    * prior `withColumn("toks", tokens(text))`), not an inline `split(...)`
    * expression — an expression here is re-evaluated for every element of
    * every lambda that mentions it (no CSE inside higher-order functions),
    * turning shingling into O(tokens²) regex splits. */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(ngrams(toks, k))

  /** ALL word n-grams, occurrence-preserving (no distinct) — the unit for
    * corpus frequency statistics (n-gram count tables, heavy hitters),
    * where every occurrence counts; [[shingles]] is the distinct-set form
    * for MinHash/Jaccard. Same materialized-`toks` caveat as shingles. */
  def ngrams(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** (id, distinct word-n-gram) pairs — the scoring unit of the
    * corpus-overlap family (x54/x55). Docs with fewer than `n` tokens
    * contribute nothing (x54's length floor). */
  def docGrams(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame =
    docs.withColumn("__toks", tokens(col(textCol)))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol),
        explode(array_distinct(ngrams(col("__toks"), n))).as("ng"))

  /** Distinct-n-gram DOCUMENT FREQUENCIES over a corpus — the maintained
    * metadata index behind the INCREMENTAL corpus-overlap score (x55):
    * one row per distinct n-gram with the count of docs containing it.
    * The index is token-level metadata (distinct-n-gram-sized, never the
    * bodies), so the maintained form scores a batch without rescanning a
    * single committed document — the x36 digest-index rationale applied
    * to x54's memorization-risk scan. */
  def ngramDf(docs: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame =
    docGrams(docs, idCol, textCol, n)
      .groupBy("ng").agg(count(lit(1)).as("ndocs"))

  /** Fold a batch's n-gram df into the maintained index — metadata-only
    * (union + one keyed sum; corpus bodies never move). Invariant
    * (spec-pinned): `ngramDfMerge(ngramDf(A), ngramDf(B)) ≡
    * ngramDf(A ∪ B)` for DISJOINT doc sets. The df table carries no doc
    * ids, so this RAW fold double-counts a replayed batch — use
    * [[ngramDfMergeSafe]] for at-least-once delivery, where the guard
    * lives INSIDE the operator instead of in a caller contract. */
  def ngramDfMerge(idx: org.apache.spark.sql.DataFrame,
                   batchDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    idx.unionByName(batchDf).groupBy("ng").agg(sum("ndocs").as("ndocs"))

  /** REPLAY-SAFE index fold — [[ngramDfMerge]] with the re-delivery
    * guard inside the operator (the m6/v30/x36 drop-up-front contract;
    * r9's one maintained-index member whose replay safety was
    * contractual rather than structural): the maintained artifact is
    * the PAIR (df table, seen doc ids) and a batch contributes only
    * docs whose id is NOT already committed, so folding the same batch
    * twice ≡ folding it once (spec-pinned). Both frames stay
    * metadata-sized (distinct grams; one id per doc — the st3 digest
    * index shape), and the batch tokenizes once; committed bodies never
    * rescan. Returns (updated df table, updated seen ids). */
  def ngramDfMergeSafe(idx: org.apache.spark.sql.DataFrame,
                       seenIds: org.apache.spark.sql.DataFrame,
                       batch: org.apache.spark.sql.DataFrame,
                       idCol: String, textCol: String, n: Int = 3)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val fresh = batch.join(seenIds.select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
    val newIdx = ngramDfMerge(idx, ngramDf(fresh, idCol, textCol, n))
    val newSeen = seenIds.select("id")
      .unionByName(fresh.select(col(idCol).as("id"))).distinct()
    (newIdx, newSeen)
  }

  /** INCREMENTAL corpus-overlap (memorization-risk) score — x54 against
    * a MAINTAINED [[ngramDf]] index: each batch doc's share of distinct
    * n-grams that appear in ≥ 2 docs of index ∪ batch. Only the BATCH
    * tokenizes; the corpus side is one left join against the df index
    * keyed by the batch's own n-grams. Equals x54 computed over the
    * full union, restricted to the batch docs (the DuckDB oracle proves
    * it on real data): a batch n-gram is duplicated iff index df +
    * within-batch df ≥ 2 — which also catches batch-internal overlap
    * the way the full scan does. */
  def dupScoreAgainst(idx: org.apache.spark.sql.DataFrame,
                      batch: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, n: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    val g = docGrams(batch, idCol, textCol, n)
    val bdf = g.groupBy("ng").agg(count(lit(1)).as("bdocs"))
    g.join(bdf, "ng")
      .join(idx.select(col("ng"), col("ndocs")), Seq("ng"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(coalesce(col("ndocs"), lit(0L)) + col("bdocs") >= 2, 1L)
          .otherwise(0L)).as("n_dup"))
      .withColumn("dup_share", round(col("n_dup") / col("n_ngrams"), 6))
  }

  /** Hashing-trick TF-IDF components: one row per (doc, bucket) with
    * weight = Σ_tokens-in-bucket tf · ln(N/df). The feature-hashing step
    * (token → one of `dim` buckets) is what makes TF-IDF vectors
    * fixed-width without a driver-side vocabulary — THE text→vector
    * bridge at corpus scale. Shape: one explode, three partial-aggregated
    * groupBys (tf, df, bucket-sum); corpus size joins as a broadcast
    * scalar.
    *
    * `bucketOf` is pluggable so an external SQL engine can replicate the
    * assignment (default: xxhash64; tests/oracles can pass an md5-derived
    * bucket both engines compute identically). */
  def hashedTfIdf(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, dim: Int,
                  bucketOf: Column => Column = null): org.apache.spark.sql.DataFrame =
    applyTfIdf(docs, idCol, textCol,
      tfIdfModel(docs, idCol, textCol, dim, bucketOf))

  /** A FITTED hashed-TF-IDF vectorizer — the corpus statistics (per-token
    * document frequency + corpus size) split out as a serve-time model.
    * [[hashedTfIdf]] is fit∘apply on the same corpus; the split exists
    * for the RETRIEVAL read path: queries arriving at serve time are NOT
    * in the corpus, so they must be embedded with the CORPUS's idf
    * weights ([[applyTfIdf]]), exactly like an LM scoring model or an
    * IVF centroid set — fit once at index build, apply per query batch.
    * Both frames are plain DataFrames (write/read like the IVF index). */
  case class TfIdfModel(dfTab: org.apache.spark.sql.DataFrame,
                        corpusN: org.apache.spark.sql.DataFrame,
                        dim: Int, bucketFn: Column => Column)

  /** Fit the vectorizer: one explode + two partial-aggregated groupBys
    * over the corpus (df = docs containing each token; n = corpus size). */
  def tfIdfModel(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, dim: Int,
                 bucketOf: Column => Column = null): TfIdfModel = {
    val bucketFn: Column => Column =
      if (bucketOf != null) bucketOf else t => pmod(xxhash64(t), lit(dim))
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    TfIdfModel(
      dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df")),
      corpusN = docs.agg(count(lit(1)).as("corpus_n")),
      dim = dim, bucketFn = bucketFn)
  }

  /** Embed texts in a fitted model's space: (id, bucket, weight)
    * components with weight = Σ tf · ln(N/df) under the MODEL's df/N.
    * Tokens unseen in the model corpus carry no df and DROP (standard
    * vectorizer OOV semantics — they would need smoothing to score).
    * Scale shape: the token join shuffles (tok, tf) rows only; at serve
    * time the text side is a query batch — tiny against the model — so
    * the join cost is the model-side token table scan, never a corpus
    * rescan. */
  def applyTfIdf(texts: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, model: TfIdfModel): org.apache.spark.sql.DataFrame = {
    val tf = texts.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    tf.join(model.dfTab, "tok")
      .crossJoin(broadcast(model.corpusN))
      .withColumn("bucket", model.bucketFn(col("tok")).cast("int"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("tf") * log(col("corpus_n") / col("df"))).as("weight"))
  }

  /** Assemble (id, bucket, weight) components into a dense `array<double>`
    * vector of length `dim` — `dim` conditional sums inside one codegen'd
    * hash aggregate (same no-HOF-fold rule as SimHash; see SCALING.md). */
  def assembleVector(components: org.apache.spark.sql.DataFrame, idCol: String,
                     dim: Int): org.apache.spark.sql.DataFrame =
    components.groupBy(col(idCol))
      .agg(array((0 until dim).map { i =>
        coalesce(sum(when(col("bucket") === i, col("weight"))), lit(0.0))
      }: _*).as("vec"))

  /** BM25 inverted index: postings carry everything a query probe needs
    * per (key, tok) — term frequency, the doc's length, and the token's
    * document frequency (df denormalized into the postings at BUILD time
    * so serve-time scoring is ONE equi-join + a broadcast stats row,
    * the production sparse-retrieval read path). `stats` is the 1-row
    * (corpus_n, avgdl) table.
    *
    * Scale shape: postings ~ total corpus tokens, partitioned by token —
    * a query probes only its own terms' posting lists (the inverted-index
    * contract), so serve cost ∝ Σ df(query terms), never corpus size.
    * Stopword-grade tokens are the skew risk (a posting list ~ corpus):
    * at 100 TB either drop model-side stopwords (df/N threshold filter on
    * the postings — one scan predicate) or cap lists; AQE skew-join
    * handles the residue. */
  case class Bm25Index(postings: org.apache.spark.sql.DataFrame,
                       stats: org.apache.spark.sql.DataFrame)

  def bm25Index(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String): Bm25Index = {
    val toks = docs.select(col(idCol).as("key"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("key", "tok").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("key").agg(sum("tf").as("dl"))
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    Bm25Index(
      postings = tf.join(dl, "key").join(dfTab, "tok")
        .select("key", "tok", "tf", "dl", "df"),
      stats = dl.agg(count(lit(1)).as("corpus_n"), avg("dl").as("avgdl")))
  }

  /** INCREMENTAL index maintenance (the x36/x45 pattern for the sparse
    * index): tokenize ONLY the new batch, union its (key, tok, tf, dl)
    * postings with the maintained index's, recompute df/stats over the
    * merged postings. The invariant — and Bm25Spec's gate — is
    * `bm25Merge(bm25Index(A), B) ≡ bm25Index(A ∪ B)` exactly for new
    * doc ids: BM25's df is a global count, so every affected token's
    * postings must see the new df (a pure append would serve stale
    * idf). Re-delivered ids (already indexed) are ignored first-seen
    * style, so the merge is idempotent under at-least-once delivery.
    *
    * Scale shape: the expensive leg of a rebuild — re-tokenizing the
    * corpus BODIES (explode + two groupBys over every document) — never
    * runs; the merge re-shuffles only the postings table (16-byte-ish
    * rows) for the df recount. At 100 TB the standard upgrade is
    * Lucene-style segments: per-segment postings with df merged at query
    * time, turning the merge into a metadata append — the serve-side
    * join shape is unchanged, so that swap is storage-layer only. */
  def bm25Merge(idx: Bm25Index, docs: org.apache.spark.sql.DataFrame,
                idCol: String, textCol: String): Bm25Index = {
    // first-seen redelivery guard (the x36/x45/StreamNearDup semantic):
    // a doc id already in the index is IGNORED — without this, an
    // at-least-once upstream would union duplicate (key, tok) postings
    // and inflate every shared token's df. The anti-join probes the
    // index's key set with the (small) batch side only.
    val fresh = docs.join(
      idx.postings.select(col("key").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
    val toks = fresh.select(col(idCol).as("key"),
      explode(tokens(col(textCol))).as("tok"))
    val btf = toks.groupBy("key", "tok").agg(count(lit(1)).as("tf"))
    val bdl = btf.groupBy("key").agg(sum("tf").as("dl"))
    val merged = idx.postings.select("key", "tok", "tf", "dl")
      .unionByName(btf.join(bdl, "key").select("key", "tok", "tf", "dl"))
    val dfTab = merged.groupBy("tok").agg(count(lit(1)).as("df"))
    Bm25Index(
      postings = merged.join(dfTab, "tok")
        .select("key", "tok", "tf", "dl", "df"),
      stats = merged.select("key", "dl").distinct()
        .agg(count(lit(1)).as("corpus_n"), avg("dl").as("avgdl")))
  }

  /** Rank key for the BM25 serves: `rankRound = Some(n)` ranks on
    * round(score, n) with the key tiebreak instead of the raw double.
    * Near-ties in a parallel double sum are ordered by last-ulp noise —
    * run-stable in Spark (deterministic partitioning) but NOT across
    * engines or across runs of a parallel SQL engine (the sf0.1 gate
    * caught DuckDB flipping two docs tied to ~1e-15 between runs of the
    * SAME oracle). Rounding to the oracle's own output precision
    * collapses such pairs to exact ties broken by key on both sides.
    * None (default) keeps raw-score ranking. */
  private def scoreRankKey(rankRound: Option[Int]): Column =
    rankRound.map(n => round(col("score"), n)).getOrElse(col("score"))

  /** Okapi BM25 top-k: score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)) with the +1-smoothed idf
    * ln(1 + (N − df + ½)/(df + ½)) (Robertson/Spärck Jones; the Lucene
    * form — query-term repeats collapse, Lucene-style). One equi-join of
    * the query terms against the posting lists, a partial-aggregated
    * per-(query, key) sum, and a bounded top-k window per query.
    * Returns (q_id, rank, key, score).
    *
    * `maxDfFrac` is the serve-side SKEW guard (SCALING.md sparse rows):
    * terms with df/N above the fraction are skipped entirely — their
    * posting lists are the ~corpus-sized mega-lists that dominate the
    * Σ df(query terms) serve cost while contributing near-zero idf.
    * The prune is a scan-side predicate on the postings (below the
    * query join), so the mega-lists never enter the shuffle. 1.0 (the
    * default) disables it — x48/x49/v23 keep exact Okapi semantics.
    *
    * `rankRound`: see [[scoreRankKey]]. */
  def bm25Search(idx: Bm25Index, queries: org.apache.spark.sql.DataFrame,
                 qId: String, textCol: String, k: Int,
                 k1: Double = 1.2, b: Double = 0.75,
                 maxDfFrac: Double = 1.0,
                 rankRound: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val qToks = queries
      .select(col(qId).as("q_id"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
    val posts =
      if (maxDfFrac >= 1.0) idx.postings
      else idx.postings.crossJoin(broadcast(idx.stats.select("corpus_n")))
        .filter(col("df") <= lit(maxDfFrac) * col("corpus_n"))
        .drop("corpus_n")
    qToks.join(posts, "tok")
      .crossJoin(broadcast(idx.stats))
      .groupBy("q_id", "key")
      .agg(sum(
        log(lit(1.0) + (col("corpus_n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .as("score"))
      // bounded-heap top-k, ranking on the (optionally rounded) score
      // with raw score carried through — candidates per query are the
      // touched posting lists, so the partial agg keeps ≤ k of them per
      // mapper out of the final shuffle (TopKAgg; bit-identical to the
      // rank window, TopKAggSpec)
      .transform(graft.functions.TopKAgg.topKByKeyOn(_, "q_id",
        scoreRankKey(rankRound), "key", "score", k))
      .select("q_id", "rank", "key", "score")
  }

  /** IMPACT-ORDERED static index pruning (Carmel et al., SIGIR'01 — the
    * standard bounded-serve mechanism): keep, per token, only the
    * `maxPostingsPerTerm` postings with the highest standalone BM25
    * contribution (the posting's score if it were the only query term),
    * tiebroken by key. Serve cost through [[bm25Search]] then becomes
    * ∝ Σ min(df, P) ≤ |query terms| · P — FLAT in corpus size, where the
    * exact index's Σ df(query terms) is linear (measured exponent 1.23,
    * SCALING.md). Surviving postings keep their TRUE (tf, dl, df), so
    * each per-term contribution is exact Okapi.
    *
    * Role: STAGE-1 CANDIDATE GENERATION for [[bm25SearchTwoStage]] (the
    * shipped bounded serve). Serving the truncated lists directly through
    * [[bm25Search]] also works but ranks by partial sums — measured
    * top-10 overlap 0.28 at P=256 on the stopword-dense fixture — so the
    * two-stage re-score is the default; direct truncated serve suits
    * only corpora whose lists are dominated by their own top impacts.
    *
    * Note the df-FRACTION guard ([[bm25Search]]'s `maxDfFrac`) is the
    * wrong knob for corpora like the driver fixture — a 31-token
    * vocabulary where 30 tokens sit in ~78% of documents, so any
    * fraction below 0.78 empties the index and anything above prunes
    * nothing. Impact truncation bounds cost regardless of the df shape.
    *
    * Scale shape: one keyed window (partition by tok) over the postings
    * at BUILD time — the impact sort a Lucene segment writer does per
    * term; mega-list partitions are the known skew and AQE's
    * skewed-partition split handles them (build-time, off the serve
    * path). */
  def bm25Prune(idx: Bm25Index, maxPostingsPerTerm: Int,
                k1: Double = 1.2, b: Double = 0.75): Bm25Index =
    pruneByImpact(idx, lit(maxPostingsPerTerm), k1, b)

  /** FRACTION-OF-CORPUS static pruning — every term's list truncated to
    * the top ⌈frac · corpus_n⌉ postings by impact (never fewer than
    * `minPerTerm`). The round-7 quality sweeps' finding productized,
    * including the measured REJECTION of the per-list-fraction
    * alternative:
    *  - a FIXED P keeps a vanishing share of corpus-sized stopword
    *    lists as the corpus grows → overlap@10 collapses
    *    (0.077 → 0.006 across 64× on the all-stopword fixture);
    *  - a per-LIST fraction (⌈frac · df⌉) ALSO collapses (0.083 at 64×)
    *    because it equally truncates the mid-size DISCRIMINATIVE lists —
    *    the terms that actually rank documents;
    *  - a fraction of the CORPUS (this knob) keeps every list shorter
    *    than frac·n WHOLE and truncates only the saturated mega-lists:
    *    measured 0.984 overlap@10 at 64× with frac ≈ 1.3% at 3.6× below
    *    the exact serve (SCALING.md r7 quality tables).
    * Candidate bound: ≤ |q terms| · frac · n — Θ(frac · n), the
    * calibrated-IVF cost shape (linear, small constant); on Zipfian real
    * corpora most query terms' lists sit far below frac·n and are never
    * touched. */
  def bm25PruneFrac(idx: Bm25Index, maxPostingsFrac: Double,
                    minPerTerm: Int = 16,
                    k1: Double = 1.2, b: Double = 0.75): Bm25Index = {
    require(maxPostingsFrac > 0 && maxPostingsFrac <= 1,
      s"maxPostingsFrac must be in (0, 1], got $maxPostingsFrac")
    pruneByImpact(idx,
      greatest(lit(minPerTerm), ceil(lit(maxPostingsFrac) * col("corpus_n"))),
      k1, b)
  }

  private def pruneByImpact(idx: Bm25Index, perTermLimit: Column,
                            k1: Double, b: Double): Bm25Index = {
    val pruned = idx.postings
      .crossJoin(broadcast(idx.stats))
      .withColumn("__impact",
        log(lit(1.0) + (col("corpus_n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      // rank window, not TopKAgg: the keep limit is a per-term COLUMN
      // (df-scaled), not a constant k — the bounded-heap aggregate needs
      // its k at plan time. One-shot build cost, not a serve path.
      .withColumn("__irk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("tok")
          .orderBy(col("__impact").desc, col("key"))))
      .filter(col("__irk") <= perTermLimit)
      .select("key", "tok", "tf", "dl", "df")
    Bm25Index(postings = pruned, stats = idx.stats)
  }

  /** BOUNDED two-stage BM25 serve — candidate generation over the
    * impact-PRUNED lists, exact Okapi re-score of the candidates against
    * the full index (the candidate-generation + re-rank split every
    * production retrieval stack uses). Stage 1 joins query terms against
    * [[bm25Prune]]'s lists only: ≤ |query terms|·P candidates per query,
    * FLAT in corpus size. Stage 2 re-scores exactly those (q, doc) pairs
    * with the full per-doc term postings — a doc's final score includes
    * every query term it contains (nothing pruned), so results are
    * EXACTLY the true BM25 ranking restricted to the candidate set, and
    * equal the exact top-k outright whenever the true top-k survives
    * candidate generation (measured 1.0 coverage at P=64 on the driver
    * fixture; Bm25Spec pins outright equality there).
    *
    * Why not serve the truncated lists directly? On stopword-dense
    * corpora (the fixture: 30 of 31 tokens in ~78% of docs) a one-stage
    * truncated serve ranks by partial sums and top-10 overlap collapses
    * (measured 0.28 at P=256) — the two-stage split keeps the bound AND
    * the ranking.
    *
    * Scale shape: stage 2 is a broadcast of the bounded candidate set
    * against the postings table — scan-side pruning, no Σ df(q terms)
    * shuffle anywhere; with the postings also stored bucketed by key
    * (the forward-index layout) the re-score join becomes a point-lookup
    * fetch of candidate docs only. */
  def bm25SearchTwoStage(full: Bm25Index, pruned: Bm25Index,
                         queries: org.apache.spark.sql.DataFrame,
                         qId: String, textCol: String, k: Int,
                         k1: Double = 1.2,
                         b: Double = 0.75,
                         rankRound: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val qToks = queries
      .select(col(qId).as("q_id"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
    val cand = qToks.join(pruned.postings.select("tok", "key"), "tok")
      .select("q_id", "key").distinct()
    full.postings
      .join(broadcast(cand), "key")
      .join(qToks, Seq("q_id", "tok"))
      .crossJoin(broadcast(full.stats))
      .groupBy("q_id", "key")
      .agg(sum(
        log(lit(1.0) + (col("corpus_n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .as("score"))
      // bounded-heap top-k, ranking on the (optionally rounded) score
      // with raw score carried through — candidates per query are the
      // touched posting lists, so the partial agg keeps ≤ k of them per
      // mapper out of the final shuffle (TopKAgg; bit-identical to the
      // rank window, TopKAggSpec)
      .transform(graft.functions.TopKAgg.topKByKeyOn(_, "q_id",
        scoreRankKey(rankRound), "key", "score", k))
      .select("q_id", "rank", "key", "score")
  }

  /** SEGMENTED BM25 maintenance — the Lucene shape the [[bm25Merge]]
    * scaladoc names, made real: each ingest batch becomes an immutable
    * segment holding df-FREE postings (key, tok, tf, dl), its TERM
    * DICTIONARY (tok → df within the segment — Lucene's per-segment
    * term metadata, term-count-sized, never posting-sized) and ONE
    * stats row (n_docs, sum_dl). Appending a batch tokenizes ONLY the
    * batch and recounts NOTHING — where [[bm25Merge]] re-shuffles the
    * whole postings table for its df recount, the segmented append
    * writes new rows + dictionary + one stats row and is done (the
    * x36/x45 incremental contract, without the global recount).
    *
    * Serve-time df is exact AND metadata-cheap: global df(tok) = the sum
    * of the per-segment dictionary rows for tok (keys are unique across
    * segments — the first-seen append guard — so the sum never double-
    * counts). The first cut derived df by COUNTING the touched posting
    * lists at query time; that recount measured +12% over the merged
    * index's serve at 64× (SCALING.md round 7) and the dictionary
    * removes it — this is exactly why Lucene keeps a term dictionary
    * per segment. Scores are bit-identical to a scratch [[bm25Index]] +
    * [[bm25Search]] over the union corpus (Bm25Spec pins it; the x51
    * DuckDB oracle proves it on real data — the oracle builds from
    * scratch).
    *
    * At 100 TB: segments are parquet partitions keyed by `seg_id`;
    * the append is a partition add; background compaction
    * ([[bm25SegmentCompact]] — pure seg_id relabel + dictionary/stats
    * sums) keeps segment counts bounded, exactly like Lucene segment
    * merging with no df math anywhere. The BOUNDED serve over segments
    * is [[bm25SearchSegmentedTwoStage]]. */
  case class Bm25Segments(postings: org.apache.spark.sql.DataFrame,
                          segStats: org.apache.spark.sql.DataFrame,
                          termDf: org.apache.spark.sql.DataFrame)

  /** First segment of a maintained index. */
  def bm25SegmentInit(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): Bm25Segments =
    bm25SegmentOf(docs, idCol, textCol, segId = 0)

  private[graft] def bm25SegmentOf(docs: org.apache.spark.sql.DataFrame,
                                   idCol: String, textCol: String,
                                   segId: Int): Bm25Segments = {
    val toks = docs.select(col(idCol).as("key"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("key", "tok").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("key").agg(sum("tf").as("dl"))
    val postings = tf.join(dl, "key")
      .select(lit(segId).as("seg_id"), col("key"), col("tok"), col("tf"),
        col("dl"))
    // stats + dictionary derive from the POSTINGS plan, not from tf
    // directly: value-identical ([[segMetaFromPostings]]'s argument), and
    // a caller that materializes the postings (the ArtifactStore
    // builders, the st6 sink, AQE's runtime exchange reuse inside a
    // single lazy serve like x51) computes the tokenize once instead of
    // three times. segStats stays the GLOBAL-agg form (not a groupBy):
    // an all-redelivered append must still emit its (segId, 0, null)
    // metadata row — Bm25Spec pins that contract for the in-memory API
    // (the st6 disk sink skips empty segments by design instead).
    Bm25Segments(
      postings = postings,
      segStats = postings.select("key", "dl").distinct()
        .agg(lit(segId).as("seg_id"), count(lit(1)).as("n_docs"),
          sum("dl").as("sum_dl")),
      termDf = postings.groupBy("seg_id", "tok")
        .agg(count(lit(1)).as("df"))
        .select("seg_id", "tok", "df"))
  }

  /** Derive per-segment stats + term dictionaries FROM a materialized
    * postings table — value-equal to the lineages [[bm25SegmentOf]]
    * derives from the tokenizer (n_docs/sum_dl over the per-key dl,
    * df = postings rows per (seg_id, tok)), but costing two
    * partial-aggregated passes over the persisted/on-disk postings
    * instead of two more corpus tokenizes. Callers that materialize
    * postings first (the prebuilt x52 index, the st6 streaming sink)
    * derive metadata through this: the r7 build tokenized each segment
    * three times (postings + stats + dictionary lineages), and the
    * extra two passes were most of the 77 task-sec x51 build. */
  def segMetaFromPostings(postings: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // dl is functionally dependent on (seg_id, key) — distinct yields
    // exactly one row per indexed doc
    val perKey = postings.select("seg_id", "key", "dl").distinct()
    (perKey.groupBy("seg_id")
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
        .select("seg_id", "n_docs", "sum_dl"),
      postings.groupBy("seg_id", "tok").agg(count(lit(1)).as("df"))
        .select("seg_id", "tok", "df"))
  }

  /** Append a batch as segment `segId`: tokenize the batch, drop already-
    * indexed ids (first-seen, at-least-once-safe — the [[bm25Merge]]
    * guard; at scale the key-membership probe is a per-segment bloom /
    * key-range metadata check, not a postings scan), union the postings
    * and metadata rows. No existing row is read-modified. */
  def bm25SegmentAppend(segs: Bm25Segments,
                        docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, segId: Int): Bm25Segments = {
    val fresh = docs.join(
      segs.postings.select(col("key").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
    val seg = bm25SegmentOf(fresh, idCol, textCol, segId)
    Bm25Segments(
      postings = segs.postings.unionByName(seg.postings),
      segStats = segs.segStats.unionByName(seg.segStats),
      termDf = segs.termDf.unionByName(seg.termDf))
  }

  /** Okapi BM25 top-k over a segmented index: the SAME one-equi-join
    * serve shape as [[bm25Search]], with df and (corpus_n, avgdl)
    * derived query-time from segment METADATA — df as the sum of the
    * touched terms' per-segment dictionary rows (exact: keys unique
    * across segments), stats from the per-segment stats rows (a
    * segment-count-sized aggregate, broadcast). Returns (q_id, rank,
    * key, score), scores exactly equal to a from-scratch index over the
    * same corpus. */
  def bm25SearchSegmented(segs: Bm25Segments,
                          queries: org.apache.spark.sql.DataFrame,
                          qId: String, textCol: String, k: Int,
                          k1: Double = 1.2,
                          b: Double = 0.75,
                          rankRound: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val qToks = queries
      .select(col(qId).as("q_id"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
    // only the query terms' posting lists — the inverted-index contract,
    // unchanged by segmentation (seg_id does not participate in the join)
    val touched = segs.postings
      .join(qToks.select("tok").distinct(), "tok")
      .select("key", "tok", "tf", "dl")
    // exact global df from the term DICTIONARY (metadata, not postings):
    // the first cut COUNTED the touched posting lists here and paid +12%
    // over the merged index's serve at 64× (SCALING.md round 7)
    val dfNow = segs.termDf
      .join(qToks.select("tok").distinct(), "tok")
      .groupBy("tok").agg(sum("df").as("df"))
    // corpus stats from segment metadata: sum_dl/n_docs are exact longs,
    // and long/long division is double in Spark SQL — bit-identical to
    // bm25Index's avg(dl)
    val stats = segs.segStats
      .agg(sum("n_docs").as("corpus_n"),
        (sum("sum_dl") / sum("n_docs")).as("avgdl"))
    qToks.join(touched, "tok").join(dfNow, "tok")
      .crossJoin(broadcast(stats))
      .groupBy("q_id", "key")
      .agg(sum(
        log(lit(1.0) + (col("corpus_n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .as("score"))
      // bounded-heap top-k, ranking on the (optionally rounded) score
      // with raw score carried through — candidates per query are the
      // touched posting lists, so the partial agg keeps ≤ k of them per
      // mapper out of the final shuffle (TopKAgg; bit-identical to the
      // rank window, TopKAggSpec)
      .transform(graft.functions.TopKAgg.topKByKeyOn(_, "q_id",
        scoreRankKey(rankRound), "key", "score", k))
      .select("q_id", "rank", "key", "score")
  }

  /** Segment COMPACTION — the background maintenance op that keeps a
    * long-lived segmented index's segment count bounded (Lucene's merge
    * policy, minus the df work: because segments are df-FREE, compaction
    * is a pure seg_id relabel — postings rows are untouched, metadata
    * rows of the merged segments collapse into one by summation). Merges
    * every segment with `seg_id <= upTo` into segment `into`. Search is
    * invariant by construction: seg_id never participates in the serve
    * join, and (n_docs, sum_dl) are sums either way (Bm25Spec pins
    * bit-equal scores pre/post). At 100 TB this is a partition rewrite of
    * only the small segments being folded — never a corpus operation. */
  def bm25SegmentCompact(segs: Bm25Segments, upTo: Int,
                         into: Int = 0): Bm25Segments =
    bm25SegmentCompactSet(segs, (0 to upTo).toSet, into)

  /** [[bm25SegmentCompact]] over an ARBITRARY segment set — the form a
    * real merge policy needs: tiered merging folds the small segments
    * wherever their ids fall (a big old segment between two small ones
    * stays untouched), not an id prefix. */
  def bm25SegmentCompactSet(segs: Bm25Segments, segIds: Set[Int],
                            into: Int): Bm25Segments = {
    val relabel = when(col("seg_id").isin(segIds.toSeq: _*), lit(into))
      .otherwise(col("seg_id"))
    Bm25Segments(
      postings = segs.postings.withColumn("seg_id", relabel),
      segStats = segs.segStats.withColumn("seg_id", relabel)
        .groupBy("seg_id")
        .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
        .select("seg_id", "n_docs", "sum_dl"),
      termDf = segs.termDf.withColumn("seg_id", relabel)
        .groupBy("seg_id", "tok").agg(sum("df").as("df"))
        .select("seg_id", "tok", "df"))
  }

  /** A segmented index viewed as a merged [[Bm25Index]] (global df from
    * the dictionaries, stats from the metadata) — the compaction-time
    * reconstruction the prune artifacts derive from. */
  private def segmentsAsIndex(segs: Bm25Segments): Bm25Index = {
    val dfG = segs.termDf.groupBy("tok").agg(sum("df").as("df"))
    Bm25Index(
      postings = segs.postings.join(dfG, "tok")
        .select("key", "tok", "tf", "dl", "df"),
      stats = segs.segStats
        .agg(sum("n_docs").as("corpus_n"),
          (sum("sum_dl") / sum("n_docs")).as("avgdl")))
  }

  /** Impact-pruned stage-1 lists over a SEGMENTED index — the
    * compaction-time analog of [[bm25Prune]]: global df from the term
    * dictionaries + stats from the segment metadata reconstruct the
    * exact impact expression, then the same per-term top-P truncation.
    * Because dictionary df is exact and current (not a stale compaction
    * snapshot), the pruned lists equal [[bm25Prune]] over a scratch
    * index of the same corpus bit-for-bit. In production this artifact
    * is refreshed at compaction cadence and is P·|vocabulary|-bounded. */
  def bm25PruneSegments(segs: Bm25Segments, maxPostingsPerTerm: Int,
                        k1: Double = 1.2, b: Double = 0.75): Bm25Index =
    bm25Prune(segmentsAsIndex(segs), maxPostingsPerTerm, k1, b)

  /** [[bm25PruneFrac]] over a segmented index — same frac semantics,
    * dictionary-df exact. */
  def bm25PruneSegmentsFrac(segs: Bm25Segments, maxPostingsFrac: Double,
                            minPerTerm: Int = 16,
                            k1: Double = 1.2, b: Double = 0.75): Bm25Index =
    bm25PruneFrac(segmentsAsIndex(segs), maxPostingsFrac, minPerTerm, k1, b)

  /** BOUNDED two-stage serve over a SEGMENTED index — the complete
    * Lucene read path: stage 1 generates ≤ |q terms|·P candidates from
    * the impact-pruned lists ([[bm25PruneSegments]], the compaction-time
    * artifact); stage 2 re-scores ONLY those docs exactly, with df from
    * the term dictionaries (metadata) and tf/dl from the candidate
    * postings (a broadcast-bounded semi-join against the posting scan —
    * key-bucketed storage turns it into a point fetch). No stage runs
    * the Σ df(query terms) shuffle the exact serve pays, and scores are
    * the TRUE BM25 values (every query term of a candidate doc counts),
    * so the result equals [[bm25SearchTwoStage]] over a scratch index
    * bit-for-bit (Bm25Spec pins it). */
  def bm25SearchSegmentedTwoStage(segs: Bm25Segments, pruned: Bm25Index,
                                  queries: org.apache.spark.sql.DataFrame,
                                  qId: String, textCol: String, k: Int,
                                  k1: Double = 1.2,
                                  b: Double = 0.75,
                                  rankRound: Option[Int] = None)
      : org.apache.spark.sql.DataFrame = {
    val qToks = queries
      .select(col(qId).as("q_id"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
    val cand = qToks.join(pruned.postings.select("tok", "key"), "tok")
      .select("q_id", "key").distinct()
    val dfNow = segs.termDf
      .join(qToks.select("tok").distinct(), "tok")
      .groupBy("tok").agg(sum("df").as("df"))
    val stats = segs.segStats
      .agg(sum("n_docs").as("corpus_n"),
        (sum("sum_dl") / sum("n_docs")).as("avgdl"))
    segs.postings
      .join(broadcast(cand), "key")
      .join(qToks, Seq("q_id", "tok"))
      .join(dfNow, "tok")
      .crossJoin(broadcast(stats))
      .groupBy("q_id", "key")
      .agg(sum(
        log(lit(1.0) + (col("corpus_n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .as("score"))
      // bounded-heap top-k, ranking on the (optionally rounded) score
      // with raw score carried through — candidates per query are the
      // touched posting lists, so the partial agg keeps ≤ k of them per
      // mapper out of the final shuffle (TopKAgg; bit-identical to the
      // rank window, TopKAggSpec)
      .transform(graft.functions.TopKAgg.topKByKeyOn(_, "q_id",
        scoreRankKey(rankRound), "key", "score", k))
      .select("q_id", "rank", "key", "score")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher): fused(q, d) =
    * Σ_legs 1/(c + rank_leg(q, d)) over however many ranked lists mention
    * d. Inputs are (q_id, rank, key) tables; the fusion is two bounded
    * scans + one grouped sum — rank lists are top-k-bounded, so the op is
    * O(q·k) at any corpus size. Returns (q_id, rank, key, rrf) with the
    * fused ranking. */
  def rrfFuse(legs: Seq[org.apache.spark.sql.DataFrame], k: Int,
              c: Int = 60): org.apache.spark.sql.DataFrame =
    legs.map(_.select(col("q_id"), col("key"),
        (lit(1.0) / (lit(c) + col("rank"))).as("contrib")))
      .reduce(_ union _)
      .groupBy("q_id", "key").agg(sum("contrib").as("rrf"))
      .transform(graft.functions.TopKAgg.topKByKey(_, "q_id", "rrf",
        "key", k))
      .select("q_id", "rank", "key", "rrf")

  /** Jaccard similarity of two string sets (inputs must be distinct
    * arrays): |A ∩ B| / |A ∪ B|. NULL-safe for empty unions. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(null)).otherwise(inter / uni)
  }

  /** ORDER-INVARIANT corpus fingerprint — the reproducibility checksum
    * two sites (or two snapshots) compare to verify they hold the
    * IDENTICAL corpus without moving a byte of it: per group, the XOR of
    * a 60-bit md5 prefix over the concatenated key columns, plus the row
    * count. XOR is commutative/associative, so the fingerprint is
    * partition-, order- and engine-invariant (the DuckDB oracle
    * replicates it bit-for-bit), and any changed, missing or extra row
    * flips it; an exact-duplicate row pair cancels in the XOR but moves
    * the count (both must match). Collision space is 2⁶⁰ per group —
    * fine for an audit, not a cryptographic commitment.
    *
    * Scale shape: one scan + one partial-aggregated groupBy (XOR
    * map-side-combines), so the 100 TB fingerprint costs one pass and
    * shuffles only group keys. Compaction/replication invariance of a
    * maintained corpus snapshot follows for free (FingerprintSpec pins
    * it across [[graft.streaming.StreamCurate.compact]]). */
  def corpusFingerprint(df: org.apache.spark.sql.DataFrame,
                        keyCols: Seq[String],
                        groupCols: Seq[String]): org.apache.spark.sql.DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(fingerprintHash(keyCols)).as("fingerprint"))

  /** The row hash under [[corpusFingerprint]] (shared with
    * [[graft.streaming.StreamCurate]]'s maintained partials): each key
    * column is md5'd SEPARATELY (fixed 32-hex width, so no
    * concatenation ambiguity — `('a|b','c')` vs `('a','b|c')` hash
    * differently, unlike a raw `concat_ws`) with NULL mapped to a
    * sentinel outside the hex alphabet (so (a,NULL) ≠ (a,'n') and NULL
    * columns aren't silently skipped), then the digest of the digests
    * is truncated to 60 bits. */
  private[graft] def fingerprintHash(keyCols: Seq[String]): Column = {
    val parts = keyCols.map(c =>
      coalesce(md5(col(c).cast("string")), lit("n")))
    conv(substring(md5(concat(parts: _*)), 1, 15), 16, 10).cast("long")
  }

  /** CROSS-REPLICA corpus comparison — [[corpusFingerprint]] of two
    * corpora joined per group: the audit two sites run to find WHICH
    * slice of a supposedly-mirrored corpus diverged (the middle rung of
    * the audit ladder: st15/x62 prove global identity in O(state),
    * this names the diverging groups, [[graft.streaming.StreamCurate
    * .diffSnapshots]] names the rows). Output per group: (n_a, n_b,
    * fp_a, fp_b, equal); groups present on only one side report with
    * the other side's count 0 and a NULL fingerprint — and
    * `equal = false`. Null-safe comparisons throughout. Cost: one
    * map-side-combined pass per side, a groups-sized join. */
  def fingerprintCompare(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame,
                         keyCols: Seq[String], groupCols: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val fa = corpusFingerprint(a, keyCols, groupCols)
      .withColumnRenamed("n_rows", "n_a")
      .withColumnRenamed("fingerprint", "fp_a")
    val fb = corpusFingerprint(b, keyCols, groupCols)
      .withColumnRenamed("n_rows", "n_b")
      .withColumnRenamed("fingerprint", "fp_b")
    fa.join(fb, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("fp_a"), col("fp_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L))
          && col("fp_a") <=> col("fp_b")).as("equal")): _*)
  }

  /** POPULATION-STABILITY-INDEX drift between a reference corpus slice
    * and a new batch over a binned feature — the pipeline monitor that
    * answers "does today's crawl still look like the corpus?" before the
    * batch is allowed in. PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) over
    * the shared bins, with add-one (Laplace) smoothing so an empty bin
    * on either side contributes a finite, honest penalty instead of ∞.
    * Conventional read: < 0.1 stable, 0.1–0.25 drifting, > 0.25 act.
    *
    * Output: one row per bin (smoothed shares + signed contribution,
    * round 6) plus a `bin = -1` summary row carrying the total PSI in
    * `contrib` — the number a monitor alerts on. Scale shape: two
    * scans' worth of partial-agg groupBy on the bin key (metadata-sized
    * from there) — no joins wider than nBins rows, nothing shuffles but
    * bin counts. The family: [[psiDrift]] (two raw sides),
    * [[psiDriftFromCounts]] (maintained-reference form — ref side is a
    * pre-counted (bin, n) table), [[psiBinCounts]] (the storable
    * partial). */

  /** Row-level clamped bin counts — the storable (bin, n) form a
    * maintained reference keeps per commit ([[graft.streaming
    * .StreamCurate.admitBatch]]'s metadata partials). Bins are CLAMPED
    * into [0, nBins): an unclamped caller expression must not silently
    * drop tail mass from the shares (out-of-range counts would still
    * inflate the total while vanishing from the per-bin join —
    * deflating every share and hiding tail drift). */
  def psiBinCounts(df: org.apache.spark.sql.DataFrame, bin: Column,
                   nBins: Int): org.apache.spark.sql.DataFrame =
    df.select(
        least(greatest(bin.cast("long"), lit(0L)), lit(nBins - 1L))
          .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  /** Laplace-smoothed shares from a (bin, n) counts table (re-clamped —
    * idempotent on [[psiBinCounts]] output, safe on raw sums). */
  private def psiShares(counts0: org.apache.spark.sql.DataFrame,
                        nBins: Int, share: String)
      : org.apache.spark.sql.DataFrame = {
    val counts = counts0.select(
        least(greatest(col("bin").cast("long"), lit(0L)),
          lit(nBins - 1L)).as("bin"), col("n"))
      .groupBy("bin").agg(sum("n").as("n"))
    val total = counts.agg(coalesce(sum("n"), lit(0L)).as("__tot"))
    // all nBins bins exist on both sides (Laplace-smoothed), so the
    // join below never drops a bin observed on only one side; an
    // EMPTY side degrades to the uniform smoothed prior (total
    // coalesced to 0), never to NULL shares — a monitor comparing
    // the summary against 0.25 must fire, not get null
    val allBins = counts0.sparkSession.range(nBins)
      .select(col("id").as("bin"))
    allBins.join(counts, Seq("bin"), "left")
      .crossJoin(broadcast(total)) // 1 row: the total
      .select(col("bin"),
        ((coalesce(col("n"), lit(0L)) + lit(1.0)) /
          (col("__tot") + lit(nBins.toDouble))).as(share))
  }

  /** [[psiDrift]] with a PRE-COUNTED reference side — the maintained-
    * reference form: `refCounts` is a (bin, n) table (e.g. the summed
    * per-commit partials a sink keeps), so the reference costs
    * metadata, never a corpus scan. Bit-equal to [[psiDrift]] when
    * `refCounts = psiBinCounts(ref, bin, nBins)` (PsiDriftSpec). */
  def psiDriftFromCounts(refCounts: org.apache.spark.sql.DataFrame,
                         cur: org.apache.spark.sql.DataFrame,
                         bin: Column, nBins: Int)
      : org.apache.spark.sql.DataFrame = {
    val joined = psiShares(refCounts, nBins, "p_ref")
      .join(psiShares(psiBinCounts(cur, bin, nBins), nBins, "p_cur"),
        Seq("bin"))
      .withColumn("contrib",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    val bins = joined.select(col("bin"),
      round(col("p_ref"), 6).as("p_ref"),
      round(col("p_cur"), 6).as("p_cur"),
      round(col("contrib"), 6).as("contrib"))
    // total PSI summed over the ROUNDED contributions (both engines sum
    // the same 6-dp values — sum-order float drift can't reach 6 dp on
    // nBins terms)
    val total = bins.agg(round(sum(col("contrib")), 6).as("contrib"))
      .select(lit(-1L).as("bin"), lit(1.0).as("p_ref"),
        lit(1.0).as("p_cur"), col("contrib"))
    bins.unionByName(total)
  }

  def psiDrift(ref: org.apache.spark.sql.DataFrame,
               cur: org.apache.spark.sql.DataFrame,
               bin: Column, nBins: Int): org.apache.spark.sql.DataFrame =
    psiDriftFromCounts(psiBinCounts(ref, bin, nBins), cur, bin, nBins)

  /** Deterministic uniform [0,1) from a row id — md5-prefix, NOT
    * `rand()`: reproducible across runs, engines and partitionings (the
    * DuckDB oracles replicate it bit-for-bit — the hashedTfIdf
    * md5-prefix trick). 24 bits of hash → resolution ~6e-8. Shared by
    * every sampling op below. */
  def md5Uniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10)
      .cast("double") / (1 << 24).toDouble

  /** Deterministic stratified sample — the training-data subsampling op
    * (e.g. downweight a dominant language): keep each row with a
    * per-stratum fraction, decided by [[md5Uniform]]; sampling is a pure
    * codegen'd filter, so it pushes into the scan stage and costs zero
    * shuffles at any corpus size. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, strataCol: String,
                       idCol: String, fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): org.apache.spark.sql.DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (s, f)) =>
      when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(md5Uniform(col(idCol)) < frac)
  }

  /** IMPORTANCE sampling with a per-row weight column in [0, 1]: keep
    * each row with probability = its weight, decided by [[md5Uniform]]
    * — the soft alternative to a hard keep/drop threshold (quality-
    * proportional subsampling, DCLM-style reweighting). The weight can
    * be any column expression (a quality score, a model score read from
    * a table); the filter itself stays scan-shaped and shuffle-free. */
  def weightedSample(df: org.apache.spark.sql.DataFrame, idCol: String,
                     weight: Column): org.apache.spark.sql.DataFrame =
    df.filter(md5Uniform(col(idCol)) < weight)

  /** Deterministic TRAINING-SHARD assignment — the loader-facing "global
    * shuffle" of a curated corpus: `shard` = ⌊md5U(id)·nShards⌋ spreads
    * documents pseudo-randomly but REPRODUCIBLY (re-runs, backfills and
    * the DuckDB oracle agree bit-for-bit), and `pos` is a second
    * independent md5 draw (id salted with "#pos") giving the within-shard
    * training order — so consecutive ids never ride the same shard in
    * their insertion order (the autocorrelation a loader must not see).
    *
    * Scale shape: both columns are scan-side codegen'd expressions —
    * ZERO shuffles until the physical write, which is
    * `repartition(nShards, shard) + sortWithinPartitions(pos)`
    * ([[writeShards]]): one shuffle, per-shard local sorts, no global
    * sort at any corpus size. */
  def trainingShards(df: org.apache.spark.sql.DataFrame, idCol: String,
                     nShards: Int): org.apache.spark.sql.DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("shard",
        floor(md5Uniform(col(idCol)) * nShards).cast("int"))
      .withColumn("pos",
        md5Uniform(concat(col(idCol).cast("string"), lit("#pos"))))
  }

  /** Takedown BLAST RADIUS over the published training shards — for a
    * deleted id set, which shards of the [[trainingShards]] release
    * contained the docs, and by how much: (shard, n_docs, n_affected,
    * n_tokens_affected, affected_share), affected shards only. The
    * operator question after every takedown: which release artifacts
    * must be regenerated, and is the damage concentrated or smeared.
    *
    * LINEAGE IS RECOMPUTED, NOT STORED: the shard assignment is a pure
    * deterministic function of the id (md5-derived — the x37
    * contract), so the inverse map "doc → shard" costs one expression
    * on a scan instead of a maintained lineage table; the same call
    * audits any historical release by passing that release's corpus
    * snapshot (time-travel or archived) and its nShards. Scale shape:
    * one scan, one broadcast left join against the takedown-sized id
    * set, one nShards-bounded groupBy — no shuffle wider than the
    * shard counts. */
  def blastRadius(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, ids: org.apache.spark.sql.DataFrame,
                  nShards: Int,
                  broadcastMaxKeys: Int = 100000)
      : org.apache.spark.sql.DataFrame = {
    val hits0 = ids.select(col(idCol)).distinct()
      .withColumn("__hit", lit(1))
    // takedown-sized id sets broadcast; past the cap the hint is
    // DROPPED (not forced) so an audit passing a corpus-scale id set
    // can't OOM the driver — AQE then picks the join from real sizes
    // (ADVICE r12: the x74 query already passes ~20% of the corpus).
    val hits =
      if (hits0.limit(broadcastMaxKeys + 1).count() <= broadcastMaxKeys)
        broadcast(hits0)
      else hits0
    trainingShards(df, idCol, nShards)
      .join(hits, Seq(idCol), "left")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__hit"), lit(0))).as("n_affected"),
        sum(when(col("__hit") === 1, tokenCount(col(textCol)))
          .otherwise(0)).cast("long").as("n_tokens_affected"))
      .filter(col("n_affected") > 0)
      .withColumn("affected_share",
        round(col("n_affected").cast("double") /
          col("n_docs").cast("double"), 6))
  }

  /** Materialize [[trainingShards]] as a sharded parquet layout
    * (`shard=K/` directories, rows pre-sorted in training order): the
    * artifact a data loader streams sequentially. One shuffle total. */
  def writeShards(df: org.apache.spark.sql.DataFrame, idCol: String,
                  nShards: Int, path: String): Unit =
    trainingShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-stratum EPOCH upsampling — the data-mixing move for scarce
    * high-value sources (repeat small strata up to `maxEpochs` times
    * rather than drowning them in the head stratum): epochs_s =
    * clamp(round(n_max / n_s), 1, maxEpochs), each row emitted once per
    * epoch with its epoch index (the loader de-correlates repeats via
    * [[trainingShards]]' salted order downstream).
    *
    * Scale shape: the epoch table is one tiny aggregate broadcast back
    * onto the scan (the [[temperatureMixSample]] lifecycle); the explode
    * multiplies rows by a bounded factor ≤ maxEpochs — output size is
    * explicit and capped, never quadratic. */
  def epochUpsample(df: org.apache.spark.sql.DataFrame, strataCol: String,
                    maxEpochs: Int = 4): org.apache.spark.sql.DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_s"))
    val nMax = counts.agg(max("n_s").as("n_max"))
    val epochs = counts.crossJoin(broadcast(nMax))
      .select(col(strataCol),
        least(lit(maxEpochs.toLong),
          greatest(lit(1L), round(col("n_max") / col("n_s")).cast("long")))
          .as("epochs"))
    df.join(broadcast(epochs), strataCol)
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
  }

  /** Train an add-one-smoothed UNIGRAM language model over the corpus —
    * the CCNet/Wikipedia-LM idea (perplexity under an in-domain LM as a
    * quality signal), shrunk to the n-gram order that stays exact and
    * oracle-able. Returns a ONE-ROW model: `vmap` = token → ln P(token)
    * over the top-`vocabSize` tokens (ties broken by token — fully
    * deterministic), `oov_lp` = ln P(unseen) = −ln(N + |V| + 1) with
    * P(tok) = (c + 1)/(N + |V| + 1).
    *
    * Scale shape: training is ONE token-count groupBy (shuffles (token,
    * count) pairs, never documents) + a top-V TakeOrdered; the model
    * collapses to a single row — the collapse-and-broadcast lifecycle of
    * the IVF centroid pack. A 100 TB corpus trains in one pass and the
    * model is a few hundred KB. */
  def unigramLm(df: org.apache.spark.sql.DataFrame, textCol: String,
                vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val counts = df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum("c").cast("double").as("n"))
    val vocab = counts.orderBy(col("c").desc, col("tok")).limit(vocabSize)
    vocab
      .agg(collect_list(struct(col("tok"), col("c"))).as("vc"),
        count(lit(1)).cast("double").as("vsize"))
      .crossJoin(broadcast(tot))
      .select(
        map_from_entries(transform(col("vc"), e =>
          struct(e.getField("tok"),
            log((e.getField("c") + lit(1)).cast("double")
              / (col("n") + col("vsize") + 1))))).as("vmap"),
        (-log(col("n") + col("vsize") + 1)).as("oov_lp"))
  }

  /** Score every document's cross-entropy / perplexity under a
    * [[unigramLm]] model — the CCNet quality-filter signal (low ppl =
    * looks like the corpus; high ppl = noise/outlier).
    *
    * Scale shape: the SCORING pass is shuffle-free — the one-row model
    * rides a broadcast, each doc folds its own token array with an
    * `aggregate` HOF over `element_at(vmap, tok)` lookups; per-doc
    * output is produced at the scan. Train once, score any number of
    * corpora (the build-once/probe-many IVF lifecycle). */
  def perplexity(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String,
                 model: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nToks = size(col("toks"))
    df.crossJoin(broadcast(model))
      .withColumn("toks", tokens(col(textCol)))
      .withColumn("lp", aggregate(col("toks"), lit(0.0d), (acc, t) =>
        acc + coalesce(element_at(col("vmap"), t), col("oov_lp"))))
      .select(col(idCol), nToks.as("n_toks"),
        round(-col("lp") / nToks, 6).as("cross_entropy"),
        round(exp(-col("lp") / nToks), 6).as("ppl"))
  }

  /** Interpolated BIGRAM LM — the depth rung above [[unigramLm]] (the
    * actual CCNet setup is a 5-gram KenLM; the bigram keeps the mechanism
    * exactly oracle-able while exercising every structural piece: context
    * counts, top-M model truncation, interpolation with the unigram
    * floor). One-row model: `bmap` = top-`nBigrams` "w1 w2" →
    * P(w2|w1) = c(bigram)/c(w1 as history) (MLE), `umap` = top-
    * `vocabSize` token → add-one P(token), `oov_p` = add-one unseen mass.
    * Interpolation (λ·P_bi + (1−λ)·P_uni in [[perplexityBigram]]) keeps
    * every position strictly positive without backoff normalization.
    *
    * Scale shape: two count groupBys (tokens; bigrams — pairs shuffle as
    * strings, bodies never) + two deterministic top-M truncations; the
    * model is again ONE broadcastable row. */
  def bigramLm(df: org.apache.spark.sql.DataFrame, textCol: String,
               vocabSize: Int, nBigrams: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0 && nBigrams > 0,
      s"sizes must be positive, got vocab=$vocabSize bigrams=$nBigrams")
    val toksCol = tokens(col(textCol))
    // unigram leg (raw probabilities — the interpolation needs P, not ln P)
    val uc = df.select(explode(toksCol).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = uc.agg(sum("c").cast("double").as("n"))
    val uni = uc.orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .agg(collect_list(struct(col("tok"), col("c"))).as("vc"),
        count(lit(1)).cast("double").as("vsize"))
      .crossJoin(broadcast(tot))
      .select(
        map_from_entries(transform(col("vc"), e =>
          struct(e.getField("tok"),
            (e.getField("c") + lit(1)).cast("double")
              / (col("n") + col("vsize") + 1)))).as("umap"),
        (lit(1.0) / (col("n") + col("vsize") + 1)).as("oov_p"))
    // bigram leg: history = the first token's occurrences AS a history.
    // The model is a NESTED map w1 → (w2 → p), not a flat "w1 w2" → p:
    // interpreted element_at is a LINEAR key scan, so a flat top-256 map
    // costs ~256 UTF8 compares per position — nesting bounds the scan by
    // |vocab| + the history's fanout and drops the per-position string
    // concat (measured ~3× on the scoring pass; results identical — the
    // (cb desc, w1, w2) cut order equals the (cb desc, "w1 w2") order
    // because tokens cannot contain the ' ' separator).
    // `toks` materialized as a column under the Generate — an inline
    // split re-evaluates once per element_at inside the pair lambda
    // (the x26 HOF trap: ~n_toks regex splits per doc)
    val bi = df.withColumn("toks", toksCol)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("e"))
      .select(col("e.w1").as("w1"), col("e.w2").as("w2"))
    val chist = bi.groupBy("w1").agg(count(lit(1)).as("ch"))
    val bmodel = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("w1"), col("w2")).limit(nBigrams)
      .join(chist, "w1")
      .groupBy("w1").agg(map_from_entries(collect_list(struct(col("w2"),
        (col("cb").cast("double") / col("ch")).as("p")))).as("m"))
      .agg(map_from_entries(collect_list(struct(col("w1"), col("m"))))
        .as("bmap"))
    bmodel.crossJoin(broadcast(uni))
  }

  /** Per-doc cross-entropy / perplexity under a [[bigramLm]] model:
    * position 1 scores on the unigram alone; every later position on
    * λ·P_bi(wᵢ|wᵢ₋₁) + (1−λ)·P_uni(wᵢ). Scoring is shuffle-free —
    * broadcast one-row model, per-doc `aggregate` fold over the
    * positions (the [[perplexity]] shape; CaseWhen keeps the i−1 lookup
    * lazily guarded at i=1). */
  def perplexityBigram(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String,
                       model: org.apache.spark.sql.DataFrame,
                       lambda: Double): org.apache.spark.sql.DataFrame = {
    require(lambda >= 0 && lambda < 1, s"lambda must be in [0,1), got $lambda")
    val nToks = size(col("toks"))
    df.crossJoin(broadcast(model))
      .withColumn("toks", tokens(col(textCol)))
      .withColumn("lp", aggregate(sequence(lit(1), nToks), lit(0.0d),
        (acc, i) => {
          val w = element_at(col("toks"), i)
          val puni = coalesce(element_at(col("umap"), w), col("oov_p"))
          // nested lookup: missing history → outer null, inner
          // element_at propagates it → coalesce floors at 0
          val pbi = coalesce(element_at(
            element_at(col("bmap"), element_at(col("toks"), i - 1)), w),
            lit(0.0d))
          acc + log(when(i === 1, puni)
            .otherwise(lit(lambda) * pbi + lit(1 - lambda) * puni))
        }))
      .select(col(idCol), nToks.as("n_toks"),
        round(-col("lp") / nToks, 6).as("cross_entropy"),
        round(exp(-col("lp") / nToks), 6).as("ppl"))
  }

  /** [[perplexityBigram]] with the scoring pass NATIVE: the one-row
    * [[bigramLm]] model is collected driver-side (vocab + top-M bigrams
    * — KBs at any corpus scale; the bloom-bits/PQ-codebook broadcast-
    * scalar lifecycle, and how a production run ships a KenLM-style
    * scoring model anyway) and embedded in ONE fused codegen expression
    * ([[graft.functions.BigramScore]]) that probes executor-local hash
    * maps, replacing the per-position interpreted `element_at` scans.
    * Results are bit-identical to the composable form (same fold order,
    * same constants, `StrictMath.log` — CorpusQualitySpec parity). */
  def perplexityBigramNative(df: org.apache.spark.sql.DataFrame, idCol: String,
                             textCol: String,
                             model: org.apache.spark.sql.DataFrame,
                             lambda: Double): org.apache.spark.sql.DataFrame = {
    require(lambda >= 0 && lambda < 1, s"lambda must be in [0,1), got $lambda")
    val r = model.head() // one-row model — bounded broadcast-scalar collect
    val bm = graft.functions.BigramModel(
      uni = r.getAs[Map[String, Double]]("umap"),
      oovP = r.getAs[Double]("oov_p"),
      bi = r.getAs[Map[String, Map[String, Double]]]("bmap"))
    val nToks = size(col("toks"))
    df.withColumn("toks", tokens(col(textCol)))
      .withColumn("lp",
        graft.functions.BigramScore.bigram_lp(col("toks"), bm, lambda))
      .select(col(idCol), nToks.as("n_toks"),
        round(-col("lp") / nToks, 6).as("cross_entropy"),
        round(exp(-col("lp") / nToks), 6).as("ppl"))
  }

  /** Sliding-window token CHUNKING — the embedding-pipeline splitter
    * (RAG / retrieval indexing): windows of `w` tokens every `s` tokens
    * (overlap w−s), last window truncated, every token covered, no
    * redundant all-inside-previous tail window:
    * nChunks = max(1, ⌈(n−w)/s⌉ + 1).
    *
    * Scale shape: pure scan-side transform+posexplode — ZERO shuffles;
    * output size is explicit (≈ n/s windows per doc). Chunk ids are
    * per-doc ordinals, so downstream embedding jobs can repartition by
    * (doc, chunk) range without a global sort. */
  def chunkSliding(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, w: Int, s: Int): org.apache.spark.sql.DataFrame = {
    require(w > 0 && s > 0 && s <= w,
      s"need 0 < stride <= window, got w=$w s=$s")
    val toks = col("toks")
    val nChunks = greatest(lit(1),
      (ceil((size(toks) - w).cast("double") / s) + 1).cast("int"))
    df.withColumn("toks", tokens(col(textCol)))
      .select(col(idCol), size(toks).as("n_doc_toks"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i =>
          array_join(slice(toks, i * s + 1, lit(w)), " ")))
          .as(Seq("chunk_id", "chunk")))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * s).as("chunk_start"),
        least(lit(w), col("n_doc_toks") - col("chunk_id") * s)
          .as("n_chunk_toks"),
        col("chunk"))
  }

  /** Contiguous GLOBAL-ID assignment without a global sort — the corpus-
    * engineering primitive behind increment appends (x36/x45 batches need
    * fresh dense ids) and loader-facing row numbering. A naive
    * `row_number() OVER (ORDER BY …)` puts 100 TB in ONE window
    * partition; this is the two-phase form: (1) md5-uniform bucketing
    * (deterministic, partitioning-independent); (2) per-bucket counts —
    * ≤ `nBuckets` rows — prefix-summed into bucket offsets (the window
    * over THAT table is tiny by construction); (3) one keyed window
    * ranks inside each bucket; id = start + offset + local rank.
    *
    * Ids depend only on the ROWS, not their arrival order or partition
    * layout (the spec proves repartition-invariance) — so re-runs and
    * backfills agree, like every md5-derived op here. One corpus shuffle
    * (the bucket window) + one broadcast. */
  def assignGlobalIds(df: org.apache.spark.sql.DataFrame, idCol: String,
                      nBuckets: Int = 1024,
                      start: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val bucketed = df.withColumn("__u", md5Uniform(col(idCol)))
      .withColumn("__bkt", floor(col("__u") * nBuckets).cast("int"))
    val offsets = bucketed.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    bucketed.join(broadcast(offsets), "__bkt")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__bkt").orderBy(col("__u"), col(idCol))))
      .withColumn("new_id", lit(start) + col("__off") + col("__rk") - 1)
      .drop("__u", "__rk", "__off", "__bkt")
  }

  /** GLOBAL curriculum rank + phase WITHOUT a global sort — the
    * curriculum-learning / staged-training move ("train on easy/clean
    * docs first, hard ones last"): every row gets its exact global rank
    * under (`order` asc, `idCol` asc) and a phase 0..nPhases-1 =
    * ⌊nPhases·(rank−1)/n⌋. A naive `row_number().over(orderBy(order))`
    * is a SINGLE-PARTITION sort at any scale; this is the x46 two-phase
    * shape instead: range-bucket the order value (one tiny min/max agg
    * sizes the envelope), per-bucket counts → broadcast prefix offsets,
    * rank = offset + within-bucket row_number — one corpus shuffle, the
    * global sequencing travels through nBuckets metadata rows.
    * Integer-exact: the phase is an integral `div` (never double
    * division, whose 2^53 mantissa would misround nPhases·(rank−1) on
    * a big-enough corpus), so the DuckDB oracle is a plain ORDER BY
    * window. Rows with a NULL or NaN order value are excluded; an
    * empty (or fully excluded) input returns an empty frame.
    *
    * Tie degeneracy: VALUE-range buckets put every copy of a heavily
    * repeated order value (a constant quality score is the limit case)
    * into ONE bucket, and one task would sort them. A second metadata
    * pass catches that: any SINGLE-VALUED bucket larger than its fair
    * share is sub-bucketed by `idCol` range (valid exactly because the
    * sort key inside a one-value bucket degenerates to the id), so the
    * per-task sort stays bounded even under a constant order column.
    * Multi-valued hot buckets are the caller's nBuckets dial, as
    * before. Requires a numerically ordered `idCol` for the tie path
    * (doc ids here); a non-numeric id skips sub-bucketing. */
  def curriculumPhases(df: org.apache.spark.sql.DataFrame, idCol: String,
                       order: Column, nPhases: Int,
                       nBuckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(nPhases > 0, s"nPhases must be positive, got $nPhases")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // NULL and NaN order values are EXCLUDED (a NaN would poison the
    // min/max envelope and bucket to 0 while the global sort order puts
    // NaN last — exclusion is the only assignment that stays consistent
    // with "rank under (order, id)" for the rows that have an order)
    val vals = df.withColumn("__v", order.cast("double"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val head = vals.agg(min(col("__v")), max(col("__v")),
      count(lit(1))).head()
    val n = head.getLong(2)
    if (n == 0L)
      return df.filter(lit(false))
        .withColumn("rank", lit(0L)).withColumn("phase", lit(0))
    val (lo, hi) = (head.getDouble(0), head.getDouble(1))
    val span = if (hi > lo) hi - lo else 1.0
    val idNumeric = df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bucketed0 = vals.withColumn("__bkt",
      least(floor((col("__v") - lit(lo)) / lit(span) * nBuckets),
        lit((nBuckets - 1).toLong)).cast("int"))
    // tie pass: single-valued buckets above their fair share split by
    // id range — one nBuckets-sized stats agg, broadcast back
    val fairShare = math.max(n / nBuckets, 1L) * 4
    val stats = bucketed0.groupBy("__bkt")
      .agg(count(lit(1)).as("__n"), min("__v").as("__vlo"),
        max("__v").as("__vhi"),
        min(col(idCol).cast("double")).as("__ilo"),
        max(col(idCol).cast("double")).as("__ihi"))
      .withColumn("__nsub",
        when(lit(idNumeric) && col("__vlo") === col("__vhi") &&
            col("__n") > fairShare && col("__ihi") > col("__ilo"),
          least(ceil(col("__n") / lit(fairShare.toDouble)),
            lit(nBuckets.toLong)))
          .otherwise(lit(1L)))
      .select("__bkt", "__nsub", "__ilo", "__ihi")
    val bucketed = bucketed0.join(broadcast(stats), "__bkt")
      .withColumn("__sbkt",
        when(col("__nsub") === 1L, lit(0L)).otherwise(
          least(floor((col(idCol).cast("double") - col("__ilo")) /
              (col("__ihi") - col("__ilo")) * col("__nsub")),
            col("__nsub") - 1L)).cast("int"))
      .drop("__nsub", "__ilo", "__ihi")
    val offsets = bucketed.groupBy("__bkt", "__sbkt")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.orderBy("__bkt", "__sbkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__sbkt"), col("__off"))
    bucketed.join(broadcast(offsets), Seq("__bkt", "__sbkt"))
      .withColumn("rank", col("__off") + row_number().over(
        Window.partitionBy("__bkt", "__sbkt")
          .orderBy(col("__v"), col(idCol))))
      .withColumn("phase",
        expr(s"CAST((${nPhases.toLong} * (rank - 1)) DIV $n AS INT)"))
      .drop("__v", "__bkt", "__sbkt", "__off")
  }

  /** Deterministic per-key CAP — the per-domain/per-source quota move
    * (a handful of mega-domains must not dominate the corpus): keep at
    * most `n` rows per key, picked in [[md5Uniform]] order (a reproducible
    * uniform sample of each key's rows, not head-of-file order).
    *
    * Scale shape: ONE shuffle keyed by `keyCol` + a rank window inside
    * each key — no global sort; skew-safe because the window only
    * needs each key's rows sorted, and AQE splits oversized keys'
    * sort spills.
    *
    * Output carries `rk` (1-based within-key sample rank) as an
    * INTENTIONAL column — callers use it for quota audits (x42) and
    * further sub-capping; a pre-existing `rk` column is replaced. The
    * working uniform draw uses a `__`-prefixed temporary like every
    * other op here, so no caller column is silently clobbered. */
  def capPerKey(df: org.apache.spark.sql.DataFrame, keyCol: String,
                idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    // winners decided on NARROW (key, u, id) rows via the bounded-heap
    // aggregate — the old keyed window hash-shuffled every full row
    // (text bodies included) to its key's reducer; here the wide rows
    // never shuffle: the ≤ n·|keys| winner rows join back onto the scan
    // (AQE broadcasts the bounded side). Same (u asc, id asc) pick.
    // The join keys on (key, id) — NOT id alone — so an id listed under
    // several keys wins or loses independently per key, exactly like
    // the window (ids need not be globally unique, only unique within
    // a key, the same contract the window's deterministic order had).
    val winners = graft.functions.TopKAgg.topKByKeyOn(
        df.select(col(keyCol), col(idCol))
          .withColumn("__u", md5Uniform(col(idCol))),
        keyCol, -col("__u"), idCol, "__u", n)
      .select(col(keyCol), col(idCol), col("rank").as("rk"))
    df.join(winners, Seq(keyCol, idCol))
      .select(df.columns.map(col) :+ col("rk"): _*)
  }

  /** Temperature-scaled mixture sampling — the multilingual/domain
    * re-weighting step (the (n_s/N)^τ scheme): per-stratum keep rates are
    * computed FROM the corpus counts, rate_s = min(1, M·n_s^τ / Σ_t n_t^τ
    * / n_s), then applied with the same deterministic md5-uniform as
    * [[stratifiedSample]]. τ < 1 flattens the mixture toward uniform
    * (dominant strata down-weighted, the standard fix for head-language
    * dominance); τ = 1 is proportional sampling. M = `targetCount` is the
    * expected sample size when no stratum saturates at rate 1.
    *
    * Unlike [[stratifiedSample]] the rates are data-dependent — but the
    * rate table is one tiny aggregate broadcast back onto the scan, so
    * the corpus-side filter stays shuffle-free at any size. */
  def temperatureMixSample(df: org.apache.spark.sql.DataFrame,
                           strataCol: String, idCol: String,
                           tau: Double, targetCount: Long): org.apache.spark.sql.DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .withColumn("pn", pow(col("n").cast("double"), tau))
    val z = counts.agg(sum("pn").as("z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(strataCol),
        least(lit(1.0),
          lit(targetCount.toDouble) * col("pn") / col("z") / col("n"))
          .as("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(md5Uniform(col(idCol)) < col("rate"))
  }

  /** BUDGET-constrained corpus selection — the "best docs until the
    * token budget runs out" curation step: order docs by (weight desc,
    * id asc) and keep the greedy prefix whose cumulative `cost` stays
    * within `budget` (a doc is kept only if it fits entirely).
    *
    * Scale shape — NO global window: a running sum over a global order
    * would put the whole corpus in one window partition (single task).
    * Instead: (1) bucket the weight (monotone, `nBuckets` levels,
    * weight assumed in [0, 1]); (2) one tiny groupBy gives per-bucket
    * cost totals, collected and prefix-summed on the driver (≤ nBuckets
    * rows — the broadcast-scalar lifecycle); (3) buckets strictly above
    * the crossing bucket pass with a pure scan filter, and ONLY the
    * crossing bucket (~1/nBuckets of the corpus) pays a keyed window
    * for the exact within-bucket prefix. Ties inside a bucket resolve
    * by exact (weight desc, id), so the result is IDENTICAL to the
    * global-window form at any nBuckets ≥ 1 — the oracle runs the
    * global form. */
  def tokenBudgetSelect(df: org.apache.spark.sql.DataFrame, idCol: String,
                        weight: Column, cost: Column, budget: Long,
                        nBuckets: Int = 1000): org.apache.spark.sql.DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val bktExpr = least(floor(weight * nBuckets), lit(nBuckets - 1))
      .cast("int")
    val totals = df.groupBy(bktExpr.as("__bkt"))
      .agg(sum(cost).as("__c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(-_._1)
    // walk buckets best-first on the driver: full buckets fit until one
    // crosses the budget; that bucket's share is the remainder
    var remaining = budget
    var cutoff = Int.MinValue // every bucket fits → no boundary window
    var boundaryBudget = 0L
    val it = totals.iterator
    while (it.hasNext && cutoff == Int.MinValue) {
      val (bkt, c) = it.next()
      if (c <= remaining) remaining -= c
      else { cutoff = bkt; boundaryBudget = remaining }
    }
    val enriched = df.withColumn("__bkt", bktExpr)
    if (cutoff == Int.MinValue) enriched.drop("__bkt") // all within budget
    else {
      val w = Window.partitionBy("__bkt")
        .orderBy(weight.desc, col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val above = enriched.filter(col("__bkt") > cutoff).drop("__bkt")
      val boundary = enriched.filter(col("__bkt") === cutoff)
        .withColumn("__cum", sum(cost).over(w))
        .filter(col("__cum") <= boundaryBudget)
        .drop("__bkt", "__cum")
      above.union(boundary)
    }
  }

  /** Distinct character trigrams — the classic language-ID feature
    * (Cavnar-Trenkle n-gram profiles). Pure codegen'd expression; empty
    * for texts shorter than 3 chars. */
  def charTrigrams(text: Column): Column =
    array_distinct(
      when(length(text) >= 3,
        transform(sequence(lit(1), length(text) - 2),
          i => text.substr(i, lit(3))))
        .otherwise(array().cast("array<string>")))

  /** Cavnar-Trenkle-style trigram language ID over a labeled corpus:
    * learn per-language profiles (top `topK` trigrams by document
    * frequency) from the rows matching `trainFilter`, then classify EVERY
    * document by profile-hit count (argmax, lexicographic tie-break;
    * documents hitting no profile predict ''). Returns
    * `(doc_id, lang, pred, correct)`.
    *
    * Scale shape: one trigram explode, two partial-aggregated groupBys;
    * the profile (topK × #languages rows) broadcasts. Accuracy is a
    * property of the DATA — TrigramLangIdSpec validates the mechanism at
    * 100% on separable languages; on the driver fixture, whose `lang`
    * label is independent of the text (all langs share one 31-token
    * vocabulary), chance level is the correct output. */
  def trigramLangId(docs: org.apache.spark.sql.DataFrame,
                    trainFilter: Column, topK: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tri = docs
      .select(col("doc_id"), col("lang"), explode(charTrigrams(col("text"))).as("tg"))
    // rank windows, not TopKAgg, in both stages: the tiebreak ids are
    // STRINGS (trigram, predicted lang) — outside the aggregate's
    // (double, long) entry — and both inputs are already partial-agg
    // reduced (distinct trigrams per lang; langs per doc)
    val prof = tri.filter(trainFilter)
      .groupBy("lang", "tg").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("n").desc, col("tg"))))
      .filter(col("rk") <= topK)
      .select(col("lang").as("plang"), col("tg"))
    val hits = tri.join(broadcast(prof), "tg")
      .groupBy("doc_id", "plang").agg(count(lit(1)).as("hits"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("hits").desc, col("plang"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("plang").as("pred"))
    docs.select("doc_id", "lang")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("pred"), lit("")).as("pred"))
      .withColumn("correct", (col("pred") === col("lang")).cast("int"))
  }
}
