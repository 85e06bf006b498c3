package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in for — as-of join and
  * bounded range join — composed from existing ops per the preference
  * order (no custom SparkPlan needed: the compositions already have the
  * right shuffle shape).
  *
  * Scale rationale:
  *  - `asofJoin` is the union + sorted carry-forward formulation: ONE
  *    shuffle keyed by the join key, then a per-key sort — the same
  *    distribution a sort-merge join would need, with no candidate
  *    blow-up (the naive "join all earlier rows, keep latest" is
  *    O(probe x quote) per key).
  *  - `rangeJoinAgg` buckets quotes by `delta`-sized time cells and
  *    joins each probe to exactly two cells, so candidates are bounded
  *    by 2x the quote rows in range — never an unbounded inequality
  *    join (which Spark would execute as a per-key cross product).
  */
object TemporalJoins {

  /** For each probe row, the latest quote row at-or-before it:
    * max (ts, id) among quotes with quote.ts <= probe.ts, per key.
    * Quotes at the probe's exact timestamp count (and order before the
    * probe); ties break by highest quote id — fully deterministic.
    *
    * Probe and quote need (keyCol, tsCol, idCol); rows without any
    * prior quote are dropped (inner as-of). Output:
    * (keyCol, tsCol, idCol, asof_ts, asof_id). */
  def asofJoin(probe: DataFrame, quote: DataFrame, keyCol: String,
               tsCol: String, idCol: String): DataFrame = {
    val p = probe.select(col(keyCol).as("k"),
      col(tsCol).cast("long").as("t"), col(idCol).cast("long").as("i"),
      lit(1).as("tag"))
    val q = quote.select(col(keyCol).as("k"),
      col(tsCol).cast("long").as("t"), col(idCol).cast("long").as("i"),
      lit(0).as("tag"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("tag"), col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(q)
      .withColumn("q", last(
        when(col("tag") === 0, struct(col("t").as("qt"), col("i").as("qi"))),
        ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("q").isNotNull)
      .select(col("k").as(keyCol), col("t").as(tsCol),
        col("i").as(idCol),
        col("q.qt").as("asof_ts"), col("q.qi").as("asof_id"))
  }

  /** Ordered N-step funnel: for each key, the earliest `steps(0)` event,
    * then the earliest `steps(1)` event at-or-after it, and so on; depth
    * = number of stages reached. Keys never reaching step 0 are dropped;
    * later missing stages surface as -1 sentinels.
    *
    * Every stage is a min-aggregate + equi-join keyed on `keyCol` — the
    * SAME partitioning end to end, so a cluster run re-shuffles nothing
    * after the first stage (and never widens: stage frames shrink
    * monotonically). Output: (keyCol, t_<step>..., depth). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val ev = events.select(col(keyCol).as("k"),
      col(tsCol).cast("long").as("t"), col(typeCol).as("ty"))
    // internal stage columns are INDEX-named (t_0..t_n): step names are
    // user data — a dot in "page.view" would parse as struct access in
    // col() resolution. Only the final output aliases carry t_<step>.
    val stage0 = ev.filter(col("ty") === steps.head)
      .groupBy("k").agg(min("t").as("t_0"))
    // each later stage joins the previous one and keeps only events
    // at-or-after the previous stage's time
    val stages = steps.zipWithIndex.tail.scanLeft(stage0) {
      case (prev, (step, i)) =>
        ev.filter(col("ty") === step)
          .join(prev.select(col("k"), col(s"t_${i - 1}")), Seq("k"))
          .filter(col("t") >= col(s"t_${i - 1}"))
          .groupBy("k").agg(min("t").as(s"t_$i"))
    }
    val joined = stages.tail.foldLeft(stage0) { (acc, st) =>
      acc.join(st.select(st.columns.head, st.columns.last), Seq("k"), "left")
    }
    val depth = (1 until steps.size).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"t_$i").isNotNull, 1L).otherwise(0L)
    }
    joined.select(
      Seq(col("k").as(keyCol), col("t_0").as(s"t_${steps.head}")) ++
        steps.tail.zipWithIndex.map { case (s, i) =>
          coalesce(col(s"t_${i + 1}"), lit(-1L)).as(s"t_$s") } ++
        Seq(depth.as("depth")): _*)
  }

  /** Per probe row, the count of quote rows in the half-open window
    * [probe.ts - delta, probe.ts), per key. Probes with zero quotes in
    * range are dropped (inner semantics — keeps the output null-free).
    * Output: (keyCol, idCol, tsCol, n_range). */
  def rangeJoinAgg(probe: DataFrame, quote: DataFrame, keyCol: String,
                   tsCol: String, idCol: String, delta: Long): DataFrame = {
    require(delta > 0, "delta must be positive")
    val q = quote.select(col(keyCol).as("k"),
      col(tsCol).cast("long").as("qt"))
      .withColumn("b", expr(s"qt div $delta"))
    // a quote in [pt-delta, pt) lives in time cell pt div delta or the
    // one before it — each probe joins exactly those two cells.
    val p = probe.select(col(keyCol).as("k"),
      col(tsCol).cast("long").as("pt"), col(idCol).cast("long").as("pid"))
      .withColumn("pb", expr(s"pt div $delta"))
      .withColumn("b", explode(array(col("pb") - 1, col("pb"))))
    p.join(q, Seq("k", "b"))
      .filter(col("qt") >= col("pt") - delta && col("qt") < col("pt"))
      .groupBy(col("k"), col("pid"), col("pt"))
      .agg(count(lit(1)).as("n_range"))
      .select(col("k").as(keyCol), col("pid").as(idCol),
        col("pt").as(tsCol), col("n_range"))
  }
}
