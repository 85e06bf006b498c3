package graft.tools

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the d2 band self-join shapes (dev tool). */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[p] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      }
    }
    val docs = Tables.documents(spark, sfDir)
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      shingles(col("text"), 3).as("sh"))
    val banded = base
      .select(col("doc_id"), minhashSignature(col("sh"), 12).as("sig"))
      .select(col("doc_id"),
        posexplode(bandHashes(col("sig"), 4, 3))
          .as(Seq("band_idx", "band_hash")))
    def candOf(right: org.apache.spark.sql.DataFrame) =
      banded.as("x").join(right.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .dropDuplicates("a_id", "b_id")
    time("cand-nohint")(candOf(banded).count())
    time("cand-merge")(candOf(banded.hint("merge")).count())
    time("cand-shuffle-hash")(candOf(banded.hint("shuffle_hash")).count())
    println("==== merge plan ====")
    candOf(banded.hint("merge")).explain()
    spark.stop()
  }
}
