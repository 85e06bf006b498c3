package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-key overhead profiler (dev tool): runs each named query once
  * warm and once timed, and splits the timed wall-clock into
  * in-job time (scheduler-visible) vs driver gap (planning, codegen,
  * checkpoint setup). Also counts jobs/stages/tasks — the orchestration
  * cost a tiny-SF bench actually measures.
  *
  * Usage: ProfileKeys key[,key...]   (SPARK_GRAFT_SF_DIR, _CPUS as Bench)
  */
object ProfileKeys {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.cleaner.periodicGC.interval", "30min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts.put(e.jobId, e.time); jobs += 1
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(e.jobId, e.time)
        jobMs += (e.time - t0)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += e.stageInfo.numTasks
      }
    })

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    println(f"${"key"}%-32s ${"wall_s"}%8s ${"job_s"}%8s ${"gap_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    keys.foreach { name =>
      // warm: JIT + store ensure + parquet footer cache
      try runOnce(name) catch { case e: Throwable =>
        println(s"$name WARM FAILED: ${e.getMessage}"); return }
      System.gc()
      jobs = 0; stages = 0; tasks = 0; jobMs = 0L
      val t0 = System.nanoTime()
      runOnce(name)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat
      Thread.sleep(200)
      println(f"$name%-32s $wall%8.2f ${jobMs / 1e3}%8.2f ${wall - jobMs / 1e3}%8.2f $jobs%5d $stages%7d $tasks%6d")
    }
    spark.stop()
  }
}
