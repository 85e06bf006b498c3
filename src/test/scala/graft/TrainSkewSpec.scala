package graft

import graft.operators.{IvfIndex, Skew}
import org.apache.spark.sql.functions._

class TrainSkewSpec extends SparkSpec {
  import spark.implicits._

  test("k-means train converges to cluster means") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 2.0f)),
      (2L, Array(10.0f, 10.0f)), (3L, Array(10.0f, 12.0f))
    ).toDF("vec_id", "embedding")
    val cents = IvfIndex.train(spark, vecs, "vec_id", "embedding",
      k = 2, iters = 3)
      .orderBy("cid").as[(Long, Seq[Double])].collect()
    // seeds are ids 0,1 (both in the left cluster) but Lloyd pulls one
    // centroid to each true cluster within a few iterations
    val sorted = cents.map(_._2).sortBy(_.head)
    assert(sorted(0).zip(Seq(0.0, 1.0)).forall { case (g, e) => math.abs(g - e) < 1e-9 })
    assert(sorted(1).zip(Seq(10.0, 11.0)).forall { case (g, e) => math.abs(g - e) < 1e-9 })
  }

  test("saltedJoin equals the plain join on skewed data") {
    val probe = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 20).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val build = (Seq("hot") ++ (1 to 20).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 100L) }.toDF("k", "w")
    val plain = probe.join(build, Seq("k"))
      .select("k", "v", "w").as[(String, Long, Long)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 8)
      .select("k", "v", "w").as[(String, Long, Long)].collect().sorted.toSeq
    assert(salted === plain)
  }
}
