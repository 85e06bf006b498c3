package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], nodes: Seq[Long],
                 maxIter: Int = 20): Map[Long, Long] =
    Clustering.connectedComponents(
      pairs.toDF("a", "b"), "a", "b", nodes.toDF("id"), "id", maxIter)
      .as[(Long, Long)].collect().toMap

  test("components merge cliques, keep singletons") {
    val r = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L)), 1L to 7L)
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("min label propagates along a chain (multi-round convergence)") {
    // path graph 9-8-7-...-1: diameter 8 forces several propagation
    // rounds; every node must still end at the global min 1
    val edges = (1L until 9L).map(i => (i, i + 1))
    val r = cc(edges, 1L to 9L)
    assert(r.values.toSet === Set(1L))
  }

  test("direction-independent: min can sit at either end of an edge") {
    val r = cc(Seq((7L, 2L), (2L, 9L), (9L, 4L)), Seq(2L, 4L, 7L, 9L))
    assert(r === Map(2L -> 2L, 4L -> 2L, 7L -> 2L, 9L -> 2L))
  }

  test("throws instead of returning unconverged labels") {
    // a 6-node chain needs 3 two-step rounds (+1 to prove the
    // fixpoint); maxIter=1 must fail loudly, never fracture clusters
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val e = intercept[IllegalStateException] {
      cc(chain, 1L to 6L, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty pair set leaves every node a singleton") {
    val r = cc(Seq.empty, 1L to 3L)
    assert(r === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
