package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n) → k minhashes → `bands` band keys → self-join on band
    * key (the only shuffle that matters, keyed by band hash) → verify
    * candidates with exact Jaccard → filter ≥ threshold.
    *
    * At scale the band-bucket join is the standard sub-quadratic LSH
    * plan; mega-buckets (skew) would be capped/salted — the band width
    * already bounds collision probability for non-near-dup docs.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      shingles(col(textCol), shingleN).as("sh"))
    val banded = base
      .select(col("doc_id"), col("sh"),
        posexplode(bandHashes(minhashSignature(col("sh"), numHashes),
          bands, rows)).as(Seq("band_idx", "band_hash")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sh").as("sha"), col("y.sh").as("shb"))
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** SimHash fingerprints (64-bit, as bit-string). Near-dup candidates
    * are docs at small Hamming distance; the fingerprint itself is the
    * shuffle-free map-only part. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      simhash64(col(textCol)).as("simhash"))

  /** n-gram Jaccard similarity pairs via inverted-index join (never a
    * cross join): explode distinct shingles, self-join on (shingle,
    * blocking key), count intersections, derive |union| arithmetically.
    * `blockCol` bounds the candidate space (at 100 TB: a real blocking
    * key — LSH band, source, time bucket). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, shingleN: Int = 2,
                        threshold: Double = 0.3): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(blockCol).as("blk"), shingles(col(textCol), shingleN).as("sh"))
    val sizes = base.select(col("doc_id"), col("blk"),
      size(col("sh")).cast("long").as("n_sh"))
    val inv = base.select(col("doc_id"), col("blk"),
      explode(col("sh")).as("s"))
    val inter = inv.as("x").join(inv.as("y"),
        col("x.s") === col("y.s") && col("x.blk") === col("y.blk") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs inside blocking groups.
    * Exact within a block; at 100 TB the block key is an LSH bucket
    * (random-hyperplane sign hash) instead of a label. */
  def embeddingNearDup(vecs: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double,
                       scale: Int = 10000): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(blockCol).cast("long").as("blk"),
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
