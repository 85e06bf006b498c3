package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-volume probe for the DEDUP bench keys (the generalization of
  * round 10's d12-only probe, VERDICT r10 item 7): the dedup family's
  * wall-clock is driven by corpus-dependent volumes — band-bucket
  * sizes (d2/d13/d20 candidate mass), verified candidate pairs, and
  * the Levenshtein DP-cell count (d12) — so when the driver
  * regenerates testdata, a bench move on these keys needs a RECEIPT
  * separating "the data moved" from "the plan regressed". This prints
  * one line per counter for an SF dir (arg 0, default the data-bound
  * replica):
  *
  *   - band-bucket histogram: banded rows, distinct buckets, hottest
  *     bucket, and the raw candidate mass Σ n·(n−1)/2 per guard cap
  *     (uncapped / d2's 64 / d13's 2) — the numbers that price every
  *     key riding the guarded LSH chain (d2, d13, d16, d17, d20, d25)
  *   - d2 verified pairs (threshold 0.5) and d20's threshold-0 pairs
  *   - d12's ASCII candidate pairs + exact DP-cell count
  *
  * Master/parallelism follow the harness tools' env convention
  * (SPARK_GRAFT_CPUS, default 4 — ADVICE r10: the old hardcoded
  * local[32] oversubscribed smaller hosts and ran the probe under a
  * different parallelism than the bench it explains).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sfbig"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    // the band front end shared by the guarded LSH chain (Dedup
    // .lshCandidates' parameters: 3-shingles, 12 hashes, 4 bands)
    val banded = docs
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), minhashSignature(col("sh"), 12).as("sig"))
      .select(col("doc_id"),
        posexplode(bandHashes(col("sig"), 4, 3))
          .as(Seq("band_idx", "band_hash")))
    val buckets = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bn"))
    def mass(cap: Long): org.apache.spark.sql.Column =
      sum(when(col("bn") <= cap, col("bn") * (col("bn") - 1) / 2)
        .otherwise(0L)).cast("long")
    val b = buckets.agg(count(lit(1)).as("n_buckets"),
        sum("bn").cast("long").as("banded_rows"),
        max("bn").cast("long").as("hottest"),
        sum(when(col("bn") > 64L, 1L).otherwise(0L)).as("over_64"),
        sum(when(col("bn") > 2L, 1L).otherwise(0L)).as("over_2"),
        mass(Long.MaxValue).as("mass_uncapped"),
        mass(64L).as("mass_cap64"),
        mass(2L).as("mass_cap2"))
      .collect()(0)
    println(s"[dedupprobe] dir=$d banded_rows=${b.getLong(1)} " +
      s"buckets=${b.getLong(0)} hottest=${b.getLong(2)} " +
      s"over64=${b.getLong(3)} over2=${b.getLong(4)} " +
      s"cand_mass_uncapped=${b.getLong(5)} cand_mass_cap64=${b.getLong(6)} " +
      s"cand_mass_cap2=${b.getLong(7)}")

    // verified-pair volumes: d2's default threshold and d20's
    // threshold-0 sweep (the band mass that actually pays the verify)
    val d2n = graft.operators.Dedup
      .minhashLsh(docs, "doc_id", "text").count()
    val d20n = graft.operators.Dedup
      .minhashLsh(docs, "doc_id", "text", threshold = 0.0).count()
    println(s"[dedupprobe] dir=$d d2_pairs=$d2n d20_pairs=$d20n")

    // d12's exact cost: ASCII candidate pairs and DP cells
    val pairs = graft.queries.Queries.d2MinhashPairs(spark, d)
      .select("a_id", "b_id")
    val ascii = "^[\\x00-\\x7F]*$"
    val t = docs.filter(col("text").rlike(ascii))
    val r = t.select(col("doc_id").as("a_id"), col("text").as("ta"))
      .join(pairs, "a_id")
      .join(t.select(col("doc_id").as("b_id"), col("text").as("tb")),
        "b_id")
      .select((length(col("ta")).cast("long") *
        length(col("tb")).cast("long")).as("cost"))
      .agg(count(lit(1)).as("n"), sum("cost").as("lev_cells"))
      .collect()(0)
    println(s"[dedupprobe] dir=$d d12_pairs=${r.getLong(0)} " +
      s"lev_cells=${r.getLong(1)}")
    spark.stop()
  }
}
