package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of every SparkEntry query and
  * greps for the scale-health signals SURVEY §4 promises:
  * PushedFilters reaching the parquet scan, pruned ReadSchema,
  * broadcast joins on small sides, whole-stage codegen coverage.
  *
  * Caveat: under AQE the pre-execution formatted plan (isFinalPlan=
  * false) does not print `[codegen id: N]` annotations, so
  * codegenSpans reads 0 for adaptive plans — not a codegen failure
  * (RDD-based plans like m2 show their spans).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n########## $name ##########")
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        println(plan)
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
        val scans = "Scan parquet".r.findAllIn(plan).size
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val cart = "CartesianProduct".r.findAllIn(plan).size
        val wsc = "codegen id".r.findAllIn(plan).size
        val exch = "(?<!Reused)Exchange".r.findAllIn(plan).size
        val reuse = "ReusedExchange".r.findAllIn(plan).size
        println(s"[audit] $name scans=$scans pushedFilterScans=$pushed " +
          s"bhj=$bhj smj=$smj bnlj=$bnlj cartesian=$cart " +
          s"exchanges=$exch reusedExchanges=$reuse codegenSpans=$wsc")
      } catch {
        case e: Throwable => println(s"[audit] $name ERROR: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
