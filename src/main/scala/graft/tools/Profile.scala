package graft.tools

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (dev tool, not part of the
  * driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def time(name: String)(f: => Long): Unit = {
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${(gcMillis - g0) / 1000.0}%6.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)

    // ---------- d2 minhash stages ----------
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      shingles(col("text"), 3).as("sh"))
    time("d2 shingles")(base.count())
    val sig = base.select(col("doc_id"),
      minhashSignature(col("sh"), 12).as("sig"))
    time("d2 minhash-sig")(sig.count())
    val banded = sig.select(col("doc_id"),
      posexplode(bandHashes(col("sig"), 4, 3)).as(Seq("band_idx", "band_hash")))
    time("d2 banded")(banded.count())
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    time("d2 cand")(cand.count())
    val full2 = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
    time("d2 full")(full2.count())
    time("d2 full-2nd")(full2.count())

    // ---------- d4 ngram-jaccard stages ----------
    val b4 = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("source").as("blk"), shingles(col("text"), 2).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
    time("d4 shingles")(b4.count())
    val inv = b4.select(col("doc_id"), col("blk"), col("n_sh"),
      explode(col("sh")).as("s"))
    time("d4 inverted")(inv.count())
    val dfreq = inv.groupBy("blk", "s").agg(count(lit(1)).as("df"))
    time("d4 dfreq")(dfreq.count())
    val wDoc = Window.partitionBy("blk", "doc_id")
      .orderBy(col("df"), col("s"))
    val pref = inv.join(dfreq, Seq("blk", "s"))
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <= col("n_sh") - ceil(lit(0.3) * col("n_sh")) + lit(1))
      .select("doc_id", "blk", "s")
    time("d4 prefix")(pref.count())
    val cand4 = pref.as("x").join(pref.as("y"),
        col("x.s") === col("y.s") && col("x.blk") === col("y.blk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    time("d4 cand-raw")(cand4.count())
    time("d4 cand-dedup")(cand4.dropDuplicates("a_id", "b_id").count())
    val full4 = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", "source", shingleN = 2, threshold = 0.3)
    time("d4 full")(full4.count())
    time("d4 full-2nd")(full4.count())
    spark.stop()
  }
}
