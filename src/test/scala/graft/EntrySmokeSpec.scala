package graft

/** Driver-contract smoke: every declared query runs at sf0.001 and
  * returns rows with the columns its oracle declares. */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and runs non-empty at sf0.001") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty, s"queries missing oracle SQL: $missing")
    val extra = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(extra.isEmpty, s"oracles without query impl: $extra")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
