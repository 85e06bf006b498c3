package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(3.0f, 4.0f), Array(1.0f, 0.0f)),
    (2L, Array(-1.0f, 1.0f), Array(2.0f, 2.0f))
  ).toDF("id", "a", "b")

  test("quantize rounds to fixed-point longs") {
    val got = df.select(quantize($"a", 10).as("q")).as[Seq[Long]].collect()
    assert(got.head === Seq(30L, 40L))
  }

  test("dot / norm / l2Dist on doubles") {
    val r = df.filter($"id" === 1)
      .select(
        dot(toDoubleArray($"a"), toDoubleArray($"b")).as("d"),
        norm(toDoubleArray($"a")).as("n"),
        l2Dist(toDoubleArray($"a"), toDoubleArray($"b")).as("l"))
      .as[(Double, Double, Double)].head()
    assert(r._1 === 3.0)
    assert(r._2 === 5.0)
    assert(math.abs(r._3 - math.sqrt(4 + 16)) < 1e-12)
  }

  test("intL2Sq and intDot are exact") {
    val r = df.select(
      intL2Sq(quantize($"a", 10), quantize($"b", 10)).as("d2"),
      intDot(quantize($"a", 10), quantize($"b", 10)).as("ip"))
      .as[(Long, Long)].collect()
    assert(r(0) === ((400L + 1600L, 300L)))      // (30,40) vs (10,0)
    assert(r(1) === ((900L + 100L, 0L)))         // (-10,10) vs (20,20): 900+100, -200+200
  }

  test("l2Normalize yields unit vectors") {
    val n = df.select(norm(l2Normalize(toDoubleArray($"a"))).as("n"))
      .as[Double].collect()
    n.foreach(x => assert(math.abs(x - 1.0) < 1e-12))
  }

  test("cosineFromInts matches double cosine") {
    val r = df.select(
      cosineFromInts(intDot(quantize($"a"), quantize($"b")),
        intNormSq(quantize($"a")), intNormSq(quantize($"b"))).as("ci"),
      cosine(toDoubleArray($"a"), toDoubleArray($"b")).as("cd"))
      .as[(Double, Double)].collect()
    r.foreach { case (ci, cd) => assert(math.abs(ci - cd) < 1e-6) }
  }
}
