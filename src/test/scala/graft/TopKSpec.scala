package graft

import graft.operators.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val scored = Seq(
    // group 1: scores 5,4,3,2,1 for ids 10..14
    (1L, 10L, 5.0), (1L, 11L, 4.0), (1L, 12L, 3.0), (1L, 13L, 2.0), (1L, 14L, 1.0),
    // group 2: tie on score 1.0 → id order decides
    (2L, 21L, 1.0), (2L, 20L, 1.0), (2L, 22L, 7.0)
  ).toDF("g", "id", "s").repartition(4) // force partial merges

  test("ascending top-k keeps smallest, ranks in order") {
    val r = TopK.perGroup(scored, "g", "id", "s", k = 2, ascending = true)
      .orderBy("g", "rnk").as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq === Seq(
      (1L, 1L, 14L, 1.0), (1L, 2L, 13L, 2.0),
      (2L, 1L, 20L, 1.0), (2L, 2L, 21L, 1.0)))
  }

  test("descending top-k keeps largest") {
    val r = TopK.perGroup(scored, "g", "id", "s", k = 1, ascending = false)
      .orderBy("g").as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq === Seq((1L, 1L, 10L, 5.0), (2L, 1L, 22L, 7.0)))
  }

  test("k larger than group returns whole group") {
    val r = TopK.perGroup(scored.filter($"g" === 2), "g", "id", "s",
      k = 10, ascending = true)
    assert(r.count() === 3)
  }
}
