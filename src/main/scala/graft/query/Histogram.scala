package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.rangeForTimestamp

/** `histogram_quantile` — the second classic PromQL-consumer computation
  * over tsdb reads (with [[Rate]]): Prometheus stores histograms as one
  * cumulative counter series per `le` bucket boundary (the data-model
  * convention the reference persists, `labels/labels.go` — `le` is just
  * a label), and the consuming engine locates the φ-quantile bucket and
  * interpolates linearly inside it.
  *
  * This operator builds the bucket matrix from raw samples and computes
  * the quantile in one relational pass:
  *
  *   1. bucket assignment — a codegen'd CASE chain over the sorted
  *      boundaries (per-row, no shuffle);
  *   2. one hash aggregate to `(series, window, le) -> n` (map-side
  *      combined — the shuffle carries at most |buckets| rows per
  *      series-window per task, not samples);
  *   3. cumulative counts + bucket lower bounds via ONE window over the
  *      ≤ |buckets|+1 rows of each series-window;
  *   4. the φ-rank bucket is the unique row where the cumulative count
  *      first reaches `φ·total`; linear interpolation inside it.
  *
  * Nothing after step 2 touches sample-scale data: the window in step 3
  * sorts |buckets|-row groups, so the whole computation scales as one
  * aggregate over the corpus — the same shape at 100 TB.
  *
  * Quantile semantics follow the Prometheus convention: each bucket
  * interpolates from the adjacent configured boundary below it (derived
  * statically from the boundary list, so buckets that received no
  * samples in a window don't widen the interval); the first finite
  * bucket interpolates from lower bound 0; a rank landing in the +Inf
  * bucket returns the highest finite boundary (no extrapolation).
  *
  * Cross-engine determinism: counts are exact longs, boundaries are
  * literals, and `φ·total`, the comparisons, and the interpolation are
  * the same double arithmetic in both engines; the result is rounded to
  * 4dp.
  */
object Histogram {

  /** Smallest boundary ≥ v, else +Inf — the `le` of the sample's bucket. */
  private def leOf(v: Column, les: Seq[Double]): Column =
    les.sorted.foldRight(lit(Double.PositiveInfinity): Column) { (b, els) =>
      when(v <= b, lit(b)).otherwise(els)
    }

  /** The configured boundary immediately below `le` (0 below the first,
    * the highest finite boundary below +Inf). Statically derived from
    * the literal boundary list — NOT `lag(le)` over the observed rows,
    * which would skip empty buckets and widen the interpolation interval
    * (Prometheus always interpolates against the adjacent configured
    * boundary, because cumulative bucket series exist even when empty). */
  private def prevLeOf(le: Column, les: Seq[Double]): Column = {
    val sorted = les.sorted
    val prev = sorted.zip(0.0 +: sorted.init)
    prev.foldRight(lit(sorted.last): Column) { case ((b, p), els) =>
      when(le === b, lit(p)).otherwise(els) // the +Inf bucket falls through to sorted.last
    }
  }

  /** φ-quantile per `(series_key, t_bucket)` from le-bucketed counts.
    * Output: `(series_key, t_bucket, total, q)`. */
  def quantile(
      samples: DataFrame,
      bucketMs: Long,
      les: Seq[Double],
      phi: Double): DataFrame = {
    require(les.nonEmpty && les.forall(b => !b.isInfinite), "finite boundaries only")
    val maxFinite = les.max
    val counts = samples
      .select(
        col("series_key"),
        rangeForTimestamp(col("t"), bucketMs).as("t_bucket"),
        leOf(col("v"), les).as("le"))
      .groupBy("series_key", "t_bucket", "le")
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("series_key", "t_bucket").orderBy("le")
    val wAll = Window.partitionBy("series_key", "t_bucket")
    val rank = col("total") * phi
    counts
      .withColumn("cum", sum("n").over(wCum))
      // empty buckets have no row, so lag(cum) == cum - n always holds
      .withColumn("prev_cum", col("cum") - col("n"))
      .withColumn("prev_le", prevLeOf(col("le"), les))
      .withColumn("total", sum("n").over(wAll))
      // the unique first bucket whose cumulative count reaches the rank
      .where(col("cum") >= rank && col("prev_cum") < rank)
      .select(
        col("series_key"), col("t_bucket"), col("total"),
        round(
          when(col("le") === Double.PositiveInfinity, lit(maxFinite))
            .otherwise(col("prev_le") +
              (col("le") - col("prev_le")) * (rank - col("prev_cum")) / col("n")),
          4).as("q"))
  }
}
