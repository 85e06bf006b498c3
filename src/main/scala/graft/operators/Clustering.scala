package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering over near-duplicate pair sets — the step a dedup
  * pipeline runs after pair generation: group pairwise-similar docs into
  * components and keep one representative per component. (The reference
  * pipeline stops at pairwise hits; this is the standard production
  * follow-on, e.g. the MinHash-cluster stage of web-scale dedup.)
  */
object Clustering {

  /** Connected components: assign every node the MINIMUM node id
    * reachable in the undirected pair graph.
    *
    * Iterative min-label propagation on DataFrames:
    * `label(v) <- min(label(v), min over neighbors u of label(u))`
    * until fixpoint — each materialized round performs TWO propagation
    * steps (so `maxIter` bounds rounds, admitting up to `2*maxIter`
    * steps ≈ graph diameter) with one hash-shuffle per step keyed on
    * node id (join + map-side-combined min aggregate). Dedup graphs are
    * unions of near-cliques, so 1-2 rounds in practice.
    *
    * `localCheckpoint` truncates the growing plan lineage each round
    * (on a real cluster: `checkpoint()` to reliable storage, same
    * call shape). Convergence is detected by a changed-label count on
    * the checkpointed (small, fixed-width) label frame — the only
    * driver-side values are per-round counters, never data rows.
    *
    * Returns (id, cluster_id) for every input node; singletons keep
    * their own id.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          nodes: DataFrame, idCol: String,
                          maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .localCheckpoint() // pair generation runs ONCE, not once per round
    var labels = nodes
      .select(col(idCol).cast("long").as("id"),
        col(idCol).cast("long").as("cluster_id"))
      .localCheckpoint()
    // One min-propagation step; `cid0` (the label at the start of the
    // materialized round) rides along so convergence is a flag column,
    // not a join against the previous labels.
    def step(l: DataFrame): DataFrame = {
      val nbMin = edges
        .join(l.select(col("id"), col("cluster_id")), col("src") === col("id"))
        .groupBy(col("dst")).agg(min("cluster_id").as("nb_min"))
      l.join(nbMin, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id")))
            .as("cluster_id"),
          col("cid0"))
    }
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // TWO propagation steps per materialized round, and a LAZY
      // checkpoint whose materializing action IS the convergence count:
      // one Spark action per round instead of four. Dedup graphs are
      // unions of near-cliques (diameter ~2), so one round usually
      // finishes the labels and the second proves the fixpoint.
      val next = step(step(labels.withColumn("cid0", col("cluster_id"))))
        .withColumn("chg", col("cluster_id") < col("cid0"))
        .localCheckpoint(false)
      val changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("cluster_id"))
      converged = changed == 0L
      iter += 1
    }
    // fail loudly: exhausting the budget means the labels are NOT a
    // fixpoint (a >2*maxIter-diameter component) — returning them would
    // silently fracture clusters
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds " +
        s"(${2 * maxIter} propagation steps); raise maxIter for " +
        "graphs of larger diameter")
    labels
  }
}
