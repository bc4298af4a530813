package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rules engine over instant-vector fill frames — the consumer
  * surface a Prometheus deployment schedules every evaluation interval
  * (rule_group evaluation in the reference ecosystem; the reference
  * tsdb feeds it through `querier.go:50-57` series selection):
  *
  *  - [[recordingRules]]: N aggregation rules evaluated TOGETHER over
  *    ONE shared fill pass — at the 100 TB design point this is the
  *    difference between rules × full-scan and one scan + rules ×
  *    frame-sized aggregates;
  *  - [[alertFiring]]: threshold alerts with a `for` duration — fire
  *    at instant t iff the condition held at EVERY lattice instant of
  *    the trailing window.
  *
  * Both consume the sparse latest-sample frame
  * ([[AsOf.latestPerInstant]]): rows exist only where a series has a
  * fresh sample, and both operators are correct WITHOUT densification
  * (aggregates see exactly the present rows; the alert's trailing
  * RANGE frame counts present-and-true instants, so a stale instant is
  * simply absent and breaks the run — PromQL's pending reset).
  */
object Rules {

  /** One recording rule: output name, grouping labels (empty = global),
    * and the aggregate over the frame's `r_v` (e.g. `sum`, `avg`). */
  final case class Rule(
      name: String,
      by: Seq[String],
      agg: Column => Column = c => round(sum(c), 2))

  /** Evaluate `rules` over one shared frame. The frame is checkpointed
    * ONCE (call-scoped, frame-sized — the same executor-loss trade
    * every localCheckpoint in this repo documents) so each rule is one
    * aggregate over materialized rows, not a re-execution of the scan
    * and fill. Output long format: `(rule, grp, t, value)` — `grp` is
    * the concatenated grouping-label values ("" for global rules, the
    * PromQL absent-label convention for missing label values is the
    * caller's frame contract). */
  def recordingRules(frame: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "recordingRules needs at least one rule")
    val shared = frame.localCheckpoint()
    rules.map { r =>
      val grp =
        if (r.by.isEmpty) lit("")
        else concat_ws(",", r.by.map(col): _*)
      shared.groupBy((r.by.map(col) :+ col("t")): _*)
        .agg(r.agg(col("r_v")).as("value"))
        .select(lit(r.name).as("rule"), grp.as("grp"), col("t"), col("value"))
    }.reduce(_ unionByName _)
  }

  /** Alert evaluation with a `for` duration of `forSteps` lattice
    * steps: a `(series_key, t)` fires iff `cond` held at every instant
    * of `[t − forSteps·stepMs, t]` — i.e. the trailing RANGE frame
    * contains exactly `forSteps + 1` present-and-true rows. Returns
    * firing rows only: `(series_key, t, value)`. */
  def alertFiring(
      frame: DataFrame,
      cond: Column,
      forSteps: Int,
      stepMs: Long): DataFrame =
    alertState(frame, cond, forSteps, stepMs)
      .where(col("state") === "firing")
      .drop("state")

  /** The full alert lifecycle per active `(series_key, t)`: `pending`
    * while the condition holds but the trailing `for` window isn't yet
    * fully satisfied, `firing` once it is — PromQL's ALERTS/alertstate
    * convention. One window over the sparse frame; inactive instants
    * (condition false or stale) emit nothing. */
  def alertState(
      frame: DataFrame,
      cond: Column,
      forSteps: Int,
      stepMs: Long): DataFrame = {
    val w = Window.partitionBy("series_key").orderBy("t")
      .rangeBetween(-forSteps.toLong * stepMs, 0)
    frame
      .withColumn("__ok", sum(when(cond, 1).otherwise(0)).over(w))
      .where(cond)
      .select(col("series_key"), col("t"), col("r_v").as("value"),
        when(col("__ok") === forSteps + 1, lit("firing"))
          .otherwise(lit("pending")).as("state"))
  }
}
