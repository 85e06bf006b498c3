package graft.tools

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
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
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      shingles(col("text"), 3).as("sh"))
    time("shingles")(base.count())
    val sig = base.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh"), 12).as("sig"))
    time("minhash-sig")(sig.count())
    val banded = sig.select(col("doc_id"), col("sh"),
      posexplode(bandHashes(col("sig"), 4, 3)).as(Seq("band_idx", "band_hash")))
    time("banded")(banded.count())
    val slim = banded.select("doc_id", "band_idx", "band_hash")
    val cand = slim.as("x").join(slim.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    time("cand-slim")(cand.count())
    val candFat = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sh").as("sha"), col("y.sh").as("shb"))
      .dropDuplicates("a_id", "b_id")
    time("cand-fat")(candFat.count())
    time("cand-fat-2nd")(candFat.count())
    val full = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
    time("full-minhashLsh")(full.count())
    time("full-minhashLsh-2nd")(full.count())
    spark.stop()
  }
}
