package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the deterministic-HLL keys (t30/e32) and the
  * persisted IVF/IVFPQ serving keys (v66/v67). Exact value parity is
  * covered by the DuckDB oracle gate; these assert the semantic
  * properties the oracle can't name: sketch-theoretic bounds, the
  * register-merge contract, and persistence round-tripping.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("t30: register counts bounded by m=4096, estimates positive, " +
    "and used_registers never exceeds the exact distinct count") {
    val rows = Queries.t30HllVocab(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val used = r.getAs[Long]("used_registers")
      val exact = r.getAs[Long]("n_exact")
      assert(used >= 1L && used <= 4096L)
      // each distinct value fills at most one register
      assert(used <= exact)
      assert(r.getAs[Double]("est_distinct") > 0.0)
    }
  }

  test("t30: the estimate tracks the exact count when cardinality is " +
    "in the raw-HLL regime (n >= 2.5m; rsd at lgK=12 is ~1.6%)") {
    Queries.t30HllVocab(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      if (exact >= 2.5 * 4096) {
        val est = r.getAs[Double]("est_distinct")
        assert(math.abs(est / exact - 1.0) < 0.10,
          s"${r.getAs[String]("source")}: est $est vs exact $exact")
      }
    }
  }

  test("e32: the day=-1 row is the REGISTER MERGE of the daily rows — " +
    "its estimate dominates every daily estimate (register-wise max " +
    "can only shrink the harmonic sum) and its exact count is bounded " +
    "by the daily exacts") {
    val rows = Queries.e32HllDau(spark, sf).collect()
    val (merged, daily) = rows.partition(_.getAs[Long]("day") == -1L)
    assert(merged.length == 1)
    assert(daily.nonEmpty)
    val m = merged.head
    val mEst = m.getAs[Double]("est_distinct")
    val mExact = m.getAs[Long]("n_exact")
    val dailyEsts = daily.map(_.getAs[Double]("est_distinct"))
    val dailyExacts = daily.map(_.getAs[Long]("n_exact"))
    assert(dailyEsts.forall(_ <= mEst + 1e-9))
    assert(mExact >= dailyExacts.max)
    assert(mExact <= dailyExacts.sum)
    assert(m.getAs[Long]("used_registers")
      >= daily.map(_.getAs[Long]("used_registers")).max)
  }

  test("e32: day coverage matches the raw event table") {
    val days = Queries.e32HllDau(spark, sf).filter($"day" =!= -1L)
      .select($"day").as[Long].collect().sorted
    val expect = graft.sources.Tables.events(spark, sf)
      .select((col("ts") / lit(86400000000000L)).cast("long").as("day"))
      .distinct().as[Long].collect().sorted
    assert(days.sameElements(expect))
  }

  test("v66: persisted IVF search returns exactly v7's rows, twice in " +
    "a row (second call serves from the saved partitioned layout)") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2))
    val live = key(Queries.v7IvfSearch(spark, sf))
    val p1 = key(Queries.v66IvfSearchPersisted(spark, sf))
    val p2 = key(Queries.v66IvfSearchPersisted(spark, sf))
    assert(p1.sameElements(live))
    assert(p2.sameElements(live))
  }

  test("v67: persisted IVFPQ search returns exactly v13's rows, twice " +
    "in a row") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2))
    val live = key(Queries.v13IvfPqSearch(spark, sf))
    val p1 = key(Queries.v67IvfpqSearchPersisted(spark, sf))
    val p2 = key(Queries.v67IvfpqSearchPersisted(spark, sf))
    assert(p1.sameElements(live))
    assert(p2.sameElements(live))
  }
}
