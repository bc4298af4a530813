package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row at or before
  * its timestamp within a lookback horizon, per join key — the
  * cross-series alignment PromQL binary ops need (join a series to the
  * most recent observation of another; the reference exposes exactly
  * the per-series iterator + seek surface this consumes,
  * `querier.go:50-57`), and the canonical time-series/point-in-time
  * enrichment operator relational engines lack.
  *
  * Spark has no ASOF JOIN; the naive encodings both fail at scale — a
  * range θ-join explodes to |L|·|R| per key before filtering, and a
  * per-left-row subquery never distributes. The scalable shape is
  * union + running `last_value`:
  *
  *   1. tag sides and union (right rows carry only key/t/value);
  *   2. ONE window per key ordered by `(t, side)` — right sorts before
  *      left at equal t, so a same-timestamp observation is visible,
  *      matching PromQL's same-instant vector matching;
  *   3. running `last(..., ignoreNulls)` fills each left row with the
  *      most recent right `(t, v)`;
  *   4. fills older than `lookbackMs` null out (the match that WOULD
  *      have won is too old ⇒ no in-window match exists at all).
  *
  * Cost: one shuffle+sort of |L|+|R| rows on the key — the same plan
  * class as any windowed read here, no blowup, AQE-skew-splittable.
  * The running fill is O(1) state per open partition.
  *
  * Requirement: `right` must be unique per `(keys, t)` (pre-aggregate
  * otherwise) — with duplicates, "the" same-instant row is undefined.
  */
object AsOf {

  /** Left rows + `(r_t, r_v)` from the latest in-window right match,
    * null when none. `right` needs columns `keys :+ t :+ r_v`. */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lookbackMs: Long): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select(keys.map(col) :+ col("t") :+ col("r_v"): _*)
      .withColumn("__side", lit(0))
    // left-only columns are null on right rows; right's r_v is null on
    // left rows until the window fills it
    val unioned = l.drop("r_v").unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy("t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rRow = when(col("__side") === 0, struct(col("t"), col("r_v")))
    unioned
      .withColumn("__r", last(rRow, ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn("__ok", col("__r.t") >= col("t") - lookbackMs)
      .withColumn("r_t", when(col("__ok"), col("__r.t")))
      .withColumn("r_v", when(col("__ok"), col("__r.r_v")))
      .drop("__side", "__r", "__ok")
  }
}
