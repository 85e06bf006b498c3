package graft

import graft.operators.LshIndex
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0001f, 0.0f, 0.0f)),   // near-identical to 1
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),     // opposite
    (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bucket keys are deterministic bitstrings; near-identical collide") {
    val b = LshIndex.bucketed(vecs, "vec_id", "embedding", dim = 4, nPlanes = 8)
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(b.values.forall(s => s.length == 8 && s.forall(c => c == '0' || c == '1')))
    assert(b(1L) === b(2L))                   // identical signs
    assert(b(1L) !== b(3L))                   // all signs flipped
    val again = LshIndex.bucketed(vecs, "vec_id", "embedding", 4, 8)
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(b === again)
  }

  test("nearDupPairs finds the planted near-duplicate only") {
    val r = LshIndex.nearDupPairs(vecs, "vec_id", "embedding", dim = 4,
      threshold = 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 2L)))
  }

  test("search returns the near-identical vector first") {
    val q = vecs.filter($"vec_id" === 1)
    val r = LshIndex.search(vecs, q, "vec_id", "embedding", "vec_id",
      dim = 4, k = 2)
      .orderBy("rnk").as[(Long, Long, Long, Double)].collect()
    assert(r(0)._3 === 1L && r(0)._4 === 0.0) // self
    assert(r(1)._3 === 2L)                    // bucket-mate
  }
}
