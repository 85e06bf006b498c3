package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id)
  private lazy val quotes = Seq(
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 20L, 102L), (1L, 50L, 103L),
    (2L, 5L, 200L)
  ).toDF("k", "t", "i")
  private lazy val probes = Seq(
    (1L, 20L, 1L),   // same-ts quotes count; tie -> highest id (102)
    (1L, 49L, 2L),   // latest prior is (20, 102)
    (1L, 60L, 3L),   // latest prior is (50, 103)
    (2L, 4L, 4L),    // no prior quote -> dropped
    (3L, 99L, 5L)    // key never quoted -> dropped
  ).toDF("k", "t", "i")

  test("asofJoin picks the latest at-or-before quote, ties to highest id") {
    val r = TemporalJoins.asofJoin(probes, quotes, "k", "t", "i")
      .select($"i", $"asof_ts", $"asof_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(r === Set((1L, 20L, 102L), (2L, 20L, 102L), (3L, 50L, 103L)))
  }

  test("rangeJoinAgg counts quotes in the half-open window per probe") {
    // delta=15: window [t-15, t)
    val r = TemporalJoins.rangeJoinAgg(probes, quotes, "k", "t", "i", 15L)
      .select($"i", $"n_range").as[(Long, Long)].collect().toMap
    // probe t=20: quotes at 10 in [5,20) -> 1 (the two at 20 excluded)
    // probe t=49: quotes in [34,49) -> none -> dropped
    // probe t=60: quote at 50 in [45,60) -> 1
    assert(r === Map(1L -> 1L, 3L -> 1L))
  }

  test("funnel: ordered steps, partial depths, -1 sentinels") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE first view doesn't count; no click after
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 40L, "purchase"),
      // user 3: view + click, no purchase; earliest valid click at 25
      (3L, 10L, "view"), (3L, 25L, "click"), (3L, 26L, "click"),
      // user 4: never views → dropped
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // user 5: purchase BETWEEN view and click doesn't count
      (5L, 10L, "view"), (5L, 15L, "purchase"), (5L, 20L, "click")
    ).toDF("u", "t", "ty")
    val r = TemporalJoins.funnel(ev, "u", "t", "ty",
        Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    assert(r === Map(
      1L -> ((10L, 20L, 30L, 3L)),
      2L -> ((10L, -1L, -1L, 1L)),
      3L -> ((10L, 25L, -1L, 2L)),
      5L -> ((10L, 20L, -1L, 2L))))
  }

  test("funnel: step names with dots resolve (index-named stages)") {
    val ev = Seq((1L, 10L, "page.view"), (1L, 20L, "add.to.cart"))
      .toDF("u", "t", "ty")
    val r = TemporalJoins.funnel(ev, "u", "t", "ty",
      Seq("page.view", "add.to.cart"))
    assert(r.columns.toSeq ===
      Seq("u", "t_page.view", "t_add.to.cart", "depth"))
    assert(r.as[(Long, Long, Long, Long)].head() === ((1L, 10L, 20L, 2L)))
    intercept[IllegalArgumentException] {
      TemporalJoins.funnel(ev, "u", "t", "ty", Seq("view", "view"))
    }
  }

  test("rangeJoinAgg equals the naive inequality join on events data") {
    val ev = graft.sources.Tables.events(spark, sf).select(
      col("user_id").cast("long").as("user_id"),
      col("event_id").cast("long").as("event_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val p = ev.filter($"event_type" === "purchase")
    val v = ev.filter($"event_type" === "view")
    val fast = TemporalJoins
      .rangeJoinAgg(p, v, "user_id", "us", "event_id", 3600000000L)
      .select($"event_id", $"n_range").as[(Long, Long)].collect().toMap
    val naive = p.as("p").join(v.as("v"),
        $"v.user_id" === $"p.user_id" &&
        $"v.us" >= $"p.us" - 3600000000L && $"v.us" < $"p.us")
      .groupBy($"p.event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fast === naive)
  }
}
