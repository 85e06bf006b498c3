package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * MinHash+LSH near-dup, SimHash fingerprinting, n-gram Jaccard, and
  * embedding-cosine near-dup. Every variant is a pure DataFrame plan —
  * hash-shuffles with map-side combines, inverted-index joins instead of
  * cross products, `broadcast` only for provably small sides.
  */
object Dedup {

  /** Exact dedup by content hash: one shuffle keyed on md5(text),
    * map-side combined. Keeps the lowest id per group. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).cast("long").as("keep_id"),
        count(lit(1)).as("n"))

  /** Incremental exact dedup for batched ingest: drop documents whose
    * content hash already exists in the seen-index (previous batches),
    * then exact-dedup within the batch. At 100 TB/day the seen-index is
    * a persisted table bucketed by `text_hash` ([[graft.sources
    * .BucketedStore]]) so the left_anti probe joins co-located buckets
    * without re-shuffling history. Returns (text_hash, keep_id, n) for
    * the genuinely-new content — the rows to append to the index. */
  def incremental(newDocs: DataFrame, idCol: String, textCol: String,
                  seenHashes: DataFrame): DataFrame =
    newDocs.withColumn("text_hash", md5(col(textCol)))
      .join(seenHashes.select("text_hash"), Seq("text_hash"), "left_anti")
      .groupBy("text_hash")
      .agg(min(col(idCol)).cast("long").as("keep_id"),
        count(lit(1)).as("n"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n) → k minhashes → `bands` band keys → self-join on band
    * key (the only shuffle that matters, keyed by band hash) → verify
    * candidates with exact Jaccard → filter ≥ threshold.
    *
    * The band-bucket join is the standard sub-quadratic LSH plan, and
    * `maxBucket` is its skew guard: a band bucket holding more than
    * `maxBucket` documents (boilerplate — thousands of near-identical
    * pages hashing every band identically) would contribute O(bucket²)
    * candidate pairs to ONE task; such buckets are excluded from
    * candidate generation entirely. Like d11's maxDf, the cap is part
    * of the operator's SEMANTICS, mirrored by the oracle — near-dup
    * families larger than maxBucket are dedup'd by the exact-hash pass
    * (d1) or surface through the capped estimator at a different band,
    * they don't silently eat the cluster.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4,
                 threshold: Double = 0.5,
                 maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val (base, _, cand) =
      lshCandidates(docs, idCol, textCol, shingleN, numHashes, bands,
        maxBucket)
    cand
      .join(base.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** Operational default for the band-bucket cap: far above anything a
    * genuine near-dup family produces at test SFs (max observed bucket
    * is 3 at sf0.01) yet small enough that one bucket's pair blow-up
    * (64² = 4096 candidates) is noise for a task. */
  val DefaultMaxBucket = 64L

  /** Containment near-dup pairs — the ASYMMETRIC companion of
    * [[minhashLsh]]: C(A,B) = |A∩B| / min(|A|,|B|) flags subset
    * duplication (a short doc embedded verbatim inside a longer one)
    * that symmetric Jaccard dilutes toward zero as the length gap
    * grows. Shares the guarded LSH candidate front end, so the band
    * semantics and the mega-bucket skew guard are identical to d2's;
    * only the verify formula differs (one `least` instead of the union
    * size). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, numHashes: Int = 12,
                       bands: Int = 4, threshold: Double = 0.5,
                       maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val (base, _, cand) =
      lshCandidates(docs, idCol, textCol, shingleN, numHashes, bands,
        maxBucket)
    cand
      .join(base.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("n_a", size(col("sha")).cast("long"))
      .withColumn("n_b", size(col("shb")).cast("long"))
      .withColumn("containment",
        col("inter") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select("a_id", "b_id", "inter", "n_a", "n_b", "containment")
  }

  /** Operational default for the SIMHASH band-bucket cap. SimHash
    * 16-bit bands are far less uniform than MinHash band hashes — band
    * bits are biased by corpus-wide token statistics, so the hottest
    * band value legitimately holds O(100) docs even at sf0.01 (max
    * observed: 159). The cap therefore sits an order of magnitude
    * higher: slack for genuine near-dup structure, while still
    * bounding a degenerate bucket's task at ~1024² ≈ 10⁶ cheap
    * xor/bit_count candidates. Boilerplate families beyond it fall to
    * d1's exact dedup or [[simhashDupEdges]]'s O(k) contraction. */
  val SimhashMaxBucket = 1024L

  /** The shared MinHash-LSH front end of [[minhashLsh]] and
    * [[minhashEstimate]] — shingle → signature → banded bucket
    * self-join → deduped candidate pairs — factored out so the banding
    * arithmetic exists ONCE on the Spark side (mirroring the single
    * shared oracle CTE chain). Returns (base(doc_id, sh),
    * sigs(doc_id, sig), cand(a_id, b_id)).
    *
    * Plan notes: only (doc_id, band) rides through the bucket
    * self-join — full shingle sets are re-joined by id AFTER candidate
    * dedup, so the band and dropDuplicates shuffles move fixed-width
    * rows. The signature is materialized as its own projection
    * (inlining it into bandHashes would re-evaluate the minhash kernel
    * once per element_at inside the Generate), and the `merge` hint
    * keeps the self-join a shuffle join so the two identical banded
    * subplans collapse into ONE reused exchange.
    *
    * The mega-bucket guard runs BEFORE the join exchange: bucket sizes
    * come from a groupBy (map-side combine ships at most one partial
    * count per (bucket, partition) — a 10⁹-row boilerplate bucket
    * arrives at its count task as ~#partitions rows, never the rows
    * themselves), the over-full bucket list is tiny by construction
    * (≤ rows/maxBucket entries), and the anti-join against it filters
    * map-side (AQE broadcasts it), so the join task for a mega bucket
    * receives NOTHING — not even the linear row set. Cost: the banded
    * projection is computed once more for the count branch; at scale
    * that linear map pass is the price of never forming a quadratic
    * task. */
  private def lshCandidates(docs: DataFrame, idCol: String,
                            textCol: String, shingleN: Int,
                            numHashes: Int, bands: Int,
                            maxBucket: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val rows = numHashes / bands
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      shingles(col(textCol), shingleN).as("sh"))
    val sigs = base.select(col("doc_id"),
      minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sigs.select(col("doc_id"),
      posexplode(bandHashes(col("sig"), bands, rows))
        .as(Seq("band_idx", "band_hash")))
    val overFull = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket)
      .select("band_idx", "band_hash")
    val kept = banded.join(overFull, Seq("band_idx", "band_hash"),
      "left_anti")
    val cand = kept.as("x").join(kept.as("y").hint("merge"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    (base, sigs, cand)
  }

  /** The PERSISTABLE band index of a seen corpus: guarded MinHash band
    * rows (doc_id, band_idx, band_hash) with over-full buckets dropped
    * AT BUILD TIME — the guard list is part of the index, exactly as a
    * production store ships it. Persist through
    * [[graft.sources.BucketedStore]] bucketed by band_hash so every
    * arriving batch probes it with ZERO index-side exchange. */
  def bandIndex(docs: DataFrame, idCol: String, textCol: String,
                shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4,
                maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val rows = numHashes / bands
    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        shingles(col(textCol), shingleN).as("sh"))
      .select(col("doc_id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("doc_id"),
        posexplode(bandHashes(col("sig"), bands, rows))
          .as(Seq("band_idx", "band_hash")))
    val overFull = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket)
      .select("band_idx", "band_hash")
    banded.join(overFull, Seq("band_idx", "band_hash"), "left_anti")
  }

  /** Incremental NEAR-dup — d9's persisted-store ingest shape applied
    * to MinHash banding: an arriving batch is banded and probes the
    * persisted [[bandIndex]] (bucketed by band_hash → sort-merge join
    * with no index-side exchange), then only the banded candidates pay
    * the exact-Jaccard verify against the base corpus BY ID. At
    * 100 TB/day this is the near-dup admission gate: per batch cost is
    * O(batch·bands) probe rows + O(candidates) verifies — the seen
    * corpus is never re-shuffled and never re-scanned beyond the
    * candidate ids. Batch-side bands are unguarded by contract (a
    * batch is ingest-sized); the index carries the guard. */
  def incrementalNearDup(batch: DataFrame, idCol: String, textCol: String,
                         seenBands: DataFrame, base: DataFrame,
                         shingleN: Int = 3, numHashes: Int = 12,
                         bands: Int = 4, threshold: Double = 0.5)
      : DataFrame = {
    val rows = numHashes / bands
    val b = batch.select(col(idCol).cast("long").as("batch_id"),
      shingles(col(textCol), shingleN).as("shb"))
    val banded = b
      .select(col("batch_id"), minhashSignature(col("shb"), numHashes).as("sig"))
      .select(col("batch_id"),
        posexplode(bandHashes(col("sig"), bands, rows))
          .as(Seq("band_idx", "band_hash")))
    val cand = banded.join(seenBands.hint("merge"),
        Seq("band_idx", "band_hash"))
      .select(col("batch_id"), col("doc_id").as("base_id"))
      .dropDuplicates("batch_id", "base_id")
    cand
      .join(b, "batch_id")
      .join(base.select(col(idCol).cast("long").as("base_id"),
        shingles(col(textCol), shingleN).as("sha")), "base_id")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "base_id", "inter", "uni", "jaccard")
  }

  /** MinHash-ESTIMATED Jaccard next to the exact value for every LSH
    * candidate pair. At 100 TB the estimator is what the pipeline
    * trusts INSTEAD of exact verification — signature agreement is O(k)
    * per pair over fixed-width rows, while exact verify re-joins full
    * shingle sets; this operator exposes both so the estimator's error
    * is measurable on real data. Same banding as [[minhashLsh]]. */
  def minhashEstimate(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 12,
                      bands: Int = 4,
                      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val (base, sigs, cand) =
      lshCandidates(docs, idCol, textCol, shingleN, numHashes, bands,
        maxBucket)
    cand
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("siga")),
        "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sigb")),
        "b_id")
      .withColumn("n_agree",
        size(filter(zip_with(col("siga"), col("sigb"), (a, b) => a === b),
          x => x)).cast("long"))
      .join(base.select(col("doc_id").as("a_id"), col("sh").as("sha")),
        "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("sh").as("shb")),
        "b_id")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .select(col("a_id"), col("b_id"), col("n_agree"),
        (col("n_agree") / lit(numHashes.toDouble)).as("est_jaccard"),
        (col("inter") / col("uni")).as("jaccard"))
  }

  /** Document-overlap pairs via shared MOSS-winnowing fingerprints —
    * catches CONTAINED/copied passages that whole-document Jaccard
    * misses (any shared run of >= w+n-1 tokens shares a fingerprint).
    * Inverted-index self-join with an explicit document-frequency cap:
    * a fingerprint present in more than `maxDf` docs is boilerplate and
    * would form a quadratic bucket at scale — the cap is part of the
    * operator's SEMANTICS (mirrored by the oracle), not an
    * approximation bolted on.
    *
    * The cap itself must not be the skew: an fp-partitioned window
    * would sort a boilerplate fingerprint's O(corpus) rows on ONE task
    * (the t8 hot-key pattern). Document frequency instead comes from a
    * map-side-combined groupBy, and the tiny over-df fingerprint list
    * is anti-joined out map-side (AQE broadcasts it) — same shape as
    * the MinHash mega-bucket guard, identical output. */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, window: Int = 4, maxDf: Long = 50,
                   minShared: Long = 2): DataFrame = {
    val fps = docs
      .select(col(idCol).cast("long").as("doc_id"),
        positionalShingleHashes(col(textCol), shingleN).as("hs"))
      .select(col("doc_id"), explode(windowMins(col("hs"), window)).as("fp"))
    val overDf = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("fp")
    val capped = fps.join(overDf, Seq("fp"), "left_anti")
      .select("doc_id", "fp")
    capped.as("x").join(capped.as("y").hint("merge"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** SimHash fingerprints (64-bit, as bit-string). Near-dup candidates
    * are docs at small Hamming distance; the fingerprint itself is the
    * shuffle-free map-only part. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      simhash64(col(textCol)).as("simhash"))

  /** SimHash near-duplicate PAIRS: Hamming-banded blocking over the
    * 64-bit fingerprints from [[simhash]], exact Hamming verification.
    *
    * `bands` bands of 64/bands bits each: a pair at Hamming distance
    * <= maxHamming differs in at most maxHamming bands, so with
    * bands > maxHamming the pigeonhole principle guarantees at least
    * one band matches exactly — the band-bucket self-join is
    * candidate-complete (no recall loss, unlike probabilistic MinHash
    * banding) for every pair whose buckets survive the `maxBucket`
    * guard. Default 4×16 bits covers maxHamming = 3.
    *
    * `maxBucket` is the same skew guard as [[minhashLsh]]'s: a k-copy
    * boilerplate family shares ALL band values, so one band bucket
    * holds k docs and the self-join forms O(k²) candidates in ONE task
    * — and for SimHash the verified OUTPUT of such a family is itself
    * quadratic (every pair is at distance ~0). Over-full buckets are
    * excluded from candidate generation entirely; the cap is part of
    * the operator's SEMANTICS, mirrored by the oracle. Families larger
    * than maxBucket are dedup'd by the exact-hash pass (d1) or
    * clustered at O(k) by [[simhashDupEdges]]'s fingerprint
    * contraction — they don't silently eat the cluster. */
  def simhashDup(docs: DataFrame, idCol: String, textCol: String,
                 bands: Int = 4, maxHamming: Int = 3,
                 maxBucket: Long = SimhashMaxBucket): DataFrame =
    simhashDupFromFp(simhash(docs, idCol, textCol), bands, maxHamming,
      maxBucket)

  /** [[simhashDup]]'s core over an existing fingerprint frame
    * `fp(doc_id, simhash)` — factored out so the pair join can run on
    * contracted (distinct-fingerprint) representatives
    * ([[simhashDupEdges]]) as well as raw documents.
    *
    * The fingerprint rides the band shuffle as `bands` packed Longs
    * (`conv(bits, 2, 10)` per band), so verification needs NO re-join
    * against the corpus — one banded subplan, computed once (`merge`
    * hint → exchange reuse), then a codegen'd per-band
    * `bit_count(a XOR b)` sum applied BEFORE the pair dedup, so the
    * dropDuplicates exchange moves only verified pairs (the 64×substr
    * HOF form of the same compare ran interpreted per element and was
    * 10× slower). Band join keys are Longs, not strings.
    *
    * The mega-bucket guard runs BEFORE the join exchange, exactly as
    * in [[lshCandidates]]: bucket sizes via a map-side-combined
    * groupBy, the tiny over-full list anti-joined out (AQE broadcasts
    * it), so a mega bucket's join task receives nothing. */
  def simhashDupFromFp(fp: DataFrame, bands: Int = 4, maxHamming: Int = 3,
                       maxBucket: Long = SimhashMaxBucket): DataFrame = {
    require(bands > maxHamming, "need bands > maxHamming for completeness")
    require(64 % bands == 0, "bands must divide 64")
    // bands=1 would make the band key the full 64-bit unsigned value:
    // conv(...).cast(long) returns NULL above 2^63 and the equi-join
    // silently drops those docs' pairs
    require(bands >= 2, "bands must be >= 2 (a 64-bit band key overflows signed Long)")
    val width = 64 / bands
    // fingerprint projected as its own column BEFORE the band packing:
    // inlining simhash64 would re-evaluate the whole md5-vote kernel
    // once per band. The frame is LAZILY CHECKPOINTED because two
    // branches consume it (the bucket-count guard and the join) and
    // the md5-vote kernel is the dominant map cost — measured at the
    // 100k-doc bench point, recomputing it for the count branch took
    // d6 from ~9 s to 15 s. The checkpoint stores 8 B/doc/band —
    // linear, local, and exactly what d3 materializes anyway.
    val banded = fp
      .localCheckpoint(false)
      .select(col("doc_id"),
        array((0 until bands).map(b =>
          conv(substring(col("simhash"), b * width + 1, width), 2, 10)
            .cast("long")): _*).as("fpv"))
      .select(col("doc_id"), col("fpv"),
        posexplode(col("fpv")).as(Seq("band_idx", "band_val")))
    val overFull = banded.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket)
      .select("band_idx", "band_val")
    val kept = banded.join(overFull, Seq("band_idx", "band_val"),
      "left_anti")
    val ham = (0 until bands)
      .map(b => bit_count(element_at(col("x.fpv"), b + 1)
        .bitwiseXOR(element_at(col("y.fpv"), b + 1))).cast("long"))
      .reduce(_ + _)
    // Hamming verify BEFORE the pair dedup: the xor/bit_count compare is
    // a few cycles per candidate (recomputing it for band-duplicate
    // pairs is free), while dropDuplicates is a shuffle — filtering
    // first means the exchange moves only verified pairs (3 longs), not
    // every band collision carrying two fingerprint arrays.
    kept.as("x").join(kept.as("y").hint("merge"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("a_id", "b_id")
  }

  /** SPANNING edges for SimHash near-dup CLUSTERING — the d7 input
    * shape. Where [[simhashDup]]'s pair output is inherently quadratic
    * in a near-dup family's size, connected components only need a
    * spanning structure, so this emits:
    *
    *  1. STAR edges from identical-fingerprint contraction: one
    *     representative (min doc_id) per distinct fingerprint, edge
    *     rep → member. Hamming distance is a function of the
    *     fingerprint alone, so contracting identical-fingerprint docs
    *     preserves components EXACTLY — a 10⁶-copy boilerplate family
    *     contributes 10⁶−1 edges (one groupBy + one key-local join),
    *     never a pair per copy².
    *  2. Verified banded pairs between the REPRESENTATIVES (distinct
    *     fingerprints) via [[simhashDupFromFp]], mega-bucket guard
    *     included — cross-fingerprint links inside an over-full band
    *     bucket are boilerplate-excluded, same semantics as d2/d6.
    *
    * With a slack cap the components equal those of the uncapped pair
    * graph: any verified pair (a, b) maps to a rep pair (or a shared
    * rep) at the same Hamming distance, and star edges close the gap. */
  def simhashDupEdges(docs: DataFrame, idCol: String, textCol: String,
                      bands: Int = 4, maxHamming: Int = 3,
                      maxBucket: Long = SimhashMaxBucket): DataFrame = {
    // checkpointed: the contraction groupBy and the star join both
    // consume the fingerprint frame — one kernel evaluation, not two
    val fp = simhash(docs, idCol, textCol).localCheckpoint(false)
    val reps = fp.groupBy("simhash").agg(min(col("doc_id")).as("rep_id"))
    // The join back on simhash re-partitions on the same key the
    // groupBy just shuffled on, so the contraction costs one exchange
    // of (doc_id, fingerprint) rows; rep_id = min(doc_id) keeps
    // a_id < b_id by construction.
    val star = fp.join(reps, Seq("simhash"))
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a_id"), col("doc_id").as("b_id"))
    val repPairs = simhashDupFromFp(
      reps.select(col("rep_id").as("doc_id"), col("simhash")),
      bands, maxHamming, maxBucket)
      .select("a_id", "b_id")
    star.unionByName(repPairs)
  }

  /** n-gram Jaccard similarity pairs via a PREFIX-FILTERED inverted-index
    * join (never a cross join, never an uncapped hot-shingle bucket).
    *
    * Candidate generation uses the standard prefix-filtering bound
    * (SSJoin/PPJoin): order each doc's shingles rarest-first by document
    * frequency within the block and keep only the first
    * `n - ceil(t*n) + 1` of them. Any pair with Jaccard >= t shares at
    * least ceil(t*max(na,nb)) shingles, and the alpha-th-largest shared
    * element (in the global df order) provably sits inside BOTH prefixes
    * — so joining prefix x prefix loses no qualifying pair, while
    * stop-shingles ("of the") with huge df fall at the END of the order
    * and out of every prefix: the quadratic hot bucket never forms.
    *
    * Verification then computes EXACT Jaccard from the full shingle
    * sets (re-joined by id — candidates are tiny), so results are
    * identical to the naive all-shared-shingles join.
    *
    * `blockCol` bounds the candidate space (at 100 TB: a real blocking
    * key — LSH band, source, time bucket). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, shingleN: Int = 2,
                        threshold: Double = 0.3): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(blockCol).as("blk"), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
    val inv = base.select(col("doc_id"), col("blk"), col("n_sh"),
      explode(col("sh")).as("s"))
    // Document frequency via groupBy + join-back, NOT a (blk, s)-
    // partitioned window: a stop-shingle's window partition grows with
    // the corpus and lands on ONE task (the d7 skew rule), while the
    // groupBy partial-aggregates map-side — the shuffle carries
    // per-mapper partial counts, never the hot shingle's rows — and
    // the join-back streams. The price is re-exploding the corpus for
    // the df branch: map-only work that parallelizes perfectly, traded
    // for removing the suite's last unbounded-key window. (df, s) is a
    // deterministic total order because shingles are distinct per doc.
    val dfreq = inv.groupBy("blk", "s").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("blk", "doc_id")
      .orderBy(col("df"), col("s"))
    // Every floating-point bound below is biased by a tiny epsilon so
    // FP rounding can only WEAKEN a filter, never strengthen it past
    // the mathematical bound (e.g. 0.4*5 = 2.0000000000000004 would
    // otherwise ceil to 3 where the true bound is 2 and drop
    // qualifying pairs). A weaker filter admits extra candidates that
    // exact verification removes; a stronger one loses output.
    val eps = 1e-9
    val pref = inv
      .join(dfreq.hint("merge"), Seq("blk", "s"))
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh") - eps) + lit(1))
      .select("doc_id", "blk", "s", "n_sh")
    // Self-join with two further LOSSLESS prunes (PPJoin-style):
    //  - length filter: J >= t forces t*na <= nb <= na/t;
    //  - count filter: a qualifying pair shares o >= ceil(t/(1+t)*(na+nb))
    //    shingles, and the j-th-largest common element (global order)
    //    sits inside both prefixes for every j >= max(ceil(t*na),
    //    ceil(t*nb)) — so at least alpha - max(...) + 1 of the shared
    //    shingles co-occur in the PREFIXES. Pairs below that prefix
    //    co-occurrence count provably cannot reach Jaccard t.
    // The `merge` hint keeps the self-join a shuffle join so the two
    // identical prefix subplans collapse into one reused exchange
    // (a broadcast side would recompute the whole upstream).
    val tt = threshold / (1.0 + threshold)
    val cand = pref.as("x").join(pref.as("y").hint("merge"),
        col("x.s") === col("y.s") && col("x.blk") === col("y.blk") &&
        col("x.doc_id") < col("y.doc_id") &&
        col("y.n_sh") * lit(threshold) <= col("x.n_sh") + eps &&
        col("x.n_sh") * lit(threshold) <= col("y.n_sh") + eps)
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.n_sh").as("pna"), col("y.n_sh").as("pnb"))
      .agg(count(lit(1)).as("pc"))
      // alpha term biased down, subtracted ceils biased up: the count
      // bound only ever relaxes under FP error
      .filter(col("pc") >= greatest(lit(1L),
        ceil(lit(tt) * (col("pna") + col("pnb")) - eps)
          - greatest(ceil(lit(threshold) * col("pna") + eps),
            ceil(lit(threshold) * col("pnb") + eps)) + lit(1)))
      .select("a_id", "b_id")
    cand
      .join(base.select(col("doc_id").as("a_id"), col("sh").as("sha"),
        col("n_sh").as("na")), "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("sh").as("shb"),
        col("n_sh").as("nb")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs inside blocking groups.
    * Exact within a block. The block key is whatever bounds the
    * quadratic: at 100 TB that is an LSH bucket (random-hyperplane
    * sign hash, [[LshIndex.bucketKey]] — bit width caps expected bucket
    * size corpus-independently), not a data column like a label whose
    * hottest value grows with the corpus. Any block column type works
    * (string bucket keys included). */
  def embeddingNearDup(vecs: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double,
                       scale: Int = DefaultScale): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(blockCol).as("blk"),
      quantize(col(vecCol), scale).as("qv"))
      .withColumn("nsq", intNormSq(col("qv")))
    v.as("x").join(v.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.blk").as("block_id"),
        cosineFromInts(intDot(col("x.qv"), col("y.qv")),
          col("x.nsq"), col("y.nsq")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
