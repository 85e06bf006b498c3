package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for v106: times the maintained-store serve's
  * pieces separately (merge materialization, tombstone anti-join, the
  * ADC serve over each) so a composition-level slowdown can be
  * attributed to the stage that actually pays it. */
object ProfileV106 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sfbig"
    // default 4, the shared probe-harness convention (ProfileDedup):
    // a hardcoded 32 oversubscribes smaller hosts and runs the probe
    // at a different parallelism than the bench it explains
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.PqIndex
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[v106probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (merged, book, gd) = graft.queries.Queries.upsertedPqCodes(spark, d)
    t("merged.count")(merged.count())
    val tomb = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").cast("long").as("dead_id"))
    val alive = merged.join(tomb, merged("id") === tomb("dead_id"),
      "left_anti")
    t("alive.count")(alive.count())
    val q = gd.filter(col("id") % 100 === 0)
    def serve(codes: org.apache.spark.sql.DataFrame): Unit =
      PqIndex.searchAdc(codes, q, "id", "qemb", 64, 8, book, k = 5)
        .write.format("noop").mode("overwrite").save()
    t("adc(merged)")(serve(merged))
    t("adc(alive)")(serve(alive))
    t("adc(alive bcast tomb)")(serve(
      merged.join(broadcast(tomb), merged("id") === tomb("dead_id"),
        "left_anti")))
    t("adc(alive ckpt)")(serve(alive.localCheckpoint()))
    for (i <- 1 to 3)
      t(s"v106 body #$i")(
        graft.queries.Queries.v106StoreMaintenance(spark, d)
          .write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      t(s"v99 body #$i")(
        graft.queries.Queries.v99CodeStoreUpsert(spark, d)
          .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
