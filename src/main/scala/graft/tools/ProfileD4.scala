package graft.tools

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B the d4 prefix-index shapes: window-based df vs groupBy+join df
  * (dev tool). */
object ProfileD4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val threshold = 0.3

    def candidates(useWindowDf: Boolean): DataFrame = {
      val base = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("source").as("blk"), shingles(col("text"), 2).as("sh"))
        .withColumn("n_sh", size(col("sh")).cast("long"))
      val inv = base.select(col("doc_id"), col("blk"), col("n_sh"),
        explode(col("sh")).as("s"))
      val wDoc = Window.partitionBy("blk", "doc_id")
        .orderBy(col("df"), col("s"))
      val withDf =
        if (useWindowDf)
          inv.withColumn("df",
            count(lit(1)).over(Window.partitionBy("blk", "s")))
        else
          inv.join(inv.groupBy("blk", "s").agg(count(lit(1)).as("df")),
            Seq("blk", "s"))
      val pref = withDf
        .withColumn("rk", row_number().over(wDoc))
        .filter(col("rk") <=
          col("n_sh") - ceil(lit(threshold) * col("n_sh")) + lit(1))
        .select("doc_id", "blk", "s", "n_sh")
      val tt = threshold / (1.0 + threshold)
      pref.as("x").join(pref.as("y").hint("merge"),
          col("x.s") === col("y.s") && col("x.blk") === col("y.blk") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("y.n_sh") * lit(threshold) <= col("x.n_sh") &&
          col("x.n_sh") * lit(threshold) <= col("y.n_sh"))
        .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          col("x.n_sh").as("pna"), col("y.n_sh").as("pnb"))
        .agg(count(lit(1)).as("pc"))
        .filter(col("pc") >= greatest(lit(1L),
          ceil(lit(tt) * (col("pna") + col("pnb")))
            - greatest(ceil(lit(threshold) * col("pna")),
              ceil(lit(threshold) * col("pnb"))) + lit(1)))
        .select("a_id", "b_id")
    }

    for (round <- 1 to 3; wdf <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val n = candidates(wdf).count()
      println(f"[d4ab] round=$round windowDf=$wdf ${(System.nanoTime() - t0) / 1e9}%6.2f s cand=$n")
    }
    spark.stop()
  }
}
