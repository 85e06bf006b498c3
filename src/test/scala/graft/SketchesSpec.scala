package graft

import graft.operators.Sketches
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("approx_count_distinct within rsd bound of exact distinct") {
    val exact = docs.groupBy("source")
      .agg(countDistinct("text").as("n")).as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinct(docs, Seq("source"), "text")
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (src, a) =>
      val e = exact(src)
      // 5% rsd → 4 sigma tolerance (plus slack for tiny groups)
      assert(math.abs(a - e) <= math.max(4, 0.2 * e),
        s"$src: approx $a vs exact $e")
    }
  }

  test("HLL sketches union to the same estimate as direct aggregation") {
    // fine: per (source, lang-bucket); coarse rollup: per source.
    val fine = Sketches.hllSketches(
      docs.withColumn("b", col("doc_id") % 4), Seq("source", "b"), "text")
    val rolled = Sketches.hllRollup(fine, Seq("source"))
      .as[(String, Long)].collect().toMap
    val direct = docs.groupBy("source")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("text"), lit(12)))
        .as("n")).as[(String, Long)].collect().toMap
    // merging per-bucket sketches must be lossless vs one-shot sketch
    assert(rolled === direct)
    val exact = docs.groupBy("source")
      .agg(countDistinct("text").as("n")).as[(String, Long)].collect().toMap
    rolled.foreach { case (src, a) =>
      assert(math.abs(a - exact(src)) <= math.max(4, 0.2 * exact(src)))
    }
  }

  test("count-min frequency estimates are one-sided and bounded") {
    val tokens = docs
      .select(explode(split(col("text"), " ")).as("t"))
    val exact = tokens.groupBy("t").count()
      .orderBy(col("count").desc).limit(20)
      .as[(String, Long)].collect()
    val n = tokens.count()
    val eps = 0.01
    val cmsBytes = tokens.agg(
      Sketches.countMin("t", eps = eps).as("s"))
      .head().getAs[Array[Byte]]("s")
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBytes))
    exact.foreach { case (tok, trueN) =>
      val est = cms.estimateCount(tok)
      assert(est >= trueN, s"count-min must never under-count ($tok)")
      assert(est <= trueN + (eps * n).toLong + 1,
        s"$tok: est $est exceeds eps*N bound over $trueN")
    }
  }

  test("approx quantiles track the exact positional p50/p90") {
    val d = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val approx = Sketches.approxQuantiles(d, Seq("source"), "n_tok",
        Seq(0.5, 0.9))
      .select(col("source"), col("quantiles")(0).as("p50"),
        col("quantiles")(1).as("p90"))
      .as[(String, Long, Long)].collect().toMap2
    val ex = graft.queries.Queries.t7LengthQuantiles(spark, sf)
      .select("source", "p50", "p90")
      .as[(String, Long, Long)].collect().toMap2
    ex.foreach { case (src, (p50, p90)) =>
      val (a50, a90) = approx(src)
      assert(math.abs(a50 - p50) <= 5, s"$src p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) <= 5, s"$src p90: $a90 vs $p90")
    }
  }

  private implicit class Tup3Ops[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(x => x._1 -> ((x._2, x._3))).toMap
  }
}
