package graft.tools

import graft.queries.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the v51 code-balance anomaly (dev tool). */
object ProfileV51 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("v11 warm-jit")(Queries.v11PqAdc(spark, sfDir).count())
    time("v11 2nd")(Queries.v11PqAdc(spark, sfDir).count())
    time("v51 full")(Queries.v51PqCodeBalance(spark, sfDir).count())
    time("v51 full-2nd")(Queries.v51PqCodeBalance(spark, sfDir).count())
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    time("v51 no-infer")(Queries.v51PqCodeBalance(spark, sfDir).count())
    time("v51 no-infer-2nd")(Queries.v51PqCodeBalance(spark, sfDir).count())
    spark.stop()
  }
}
