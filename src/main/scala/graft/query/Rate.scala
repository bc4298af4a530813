package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.rangeForTimestamp

/** Counter increase/rate — the PromQL-consumer computation over tsdb
  * reads. The reference stores raw monotone counters and leaves
  * `rate()` to the consuming engine, whose iterator machinery is
  * exactly the W1 lookback surface (`querier.go:50-57` series
  * iteration + BufferedSeriesIterator peek-back); this is that
  * consumer's aggregation, Spark-native.
  *
  * Counter semantics: a drop (v < previous v) is a *reset* — the
  * counter restarted near zero, so the post-reset value itself is the
  * increase since the reset (the standard Prometheus convention).
  *
  * Plan shape: ONE window partitioned by series (consumed directly
  * from a bucketed store scan with no exchange — the same property
  * `ts_vertical_dedup` plan-asserts) followed by one hash aggregate
  * with map-side partial combine. Nothing is quadratic, nothing
  * collects: this scales as a single pass over the samples.
  */
object Rate {

  /** Per `(series_key, t_bucket)` counter increase and per-second rate.
    *
    * The lag runs over the series' whole stream (ordered by
    * `(t, sample_id)` — the deterministic total order the other ts
    * queries use), so the first sample of a bucket measures against the
    * last sample of the previous bucket; a bucket's `increase` is the
    * sum of its samples' deltas with resets replaced by the post-reset
    * value. `n_deltas` counts contributing deltas, `n_resets` the
    * detected resets.
    *
    * Float determinism: `increase` is a sum of doubles, rounded (2dp)
    * like every cross-engine-checked sum in this suite; `rate_per_sec`
    * divides the *rounded* increase by the exact bucket seconds so both
    * engines divide identical bits. */
  def increase(samples: DataFrame, bucketMs: Long): DataFrame = {
    val w = Window.partitionBy("series_key").orderBy("t", "sample_id")
    val prev = samples
      .withColumn("__prev_v", lag("v", 1).over(w))
    val inc = prev.select(
      col("series_key"),
      rangeForTimestamp(col("t"), bucketMs).as("t_bucket"),
      when(col("__prev_v").isNull, lit(null).cast("double"))
        .when(col("v") >= col("__prev_v"), col("v") - col("__prev_v"))
        .otherwise(col("v"))
        .as("__inc"),
      (col("__prev_v").isNotNull && col("v") < col("__prev_v"))
        .cast("long").as("__reset"))
    inc.groupBy("series_key", "t_bucket")
      .agg(
        round(sum("__inc"), 2).as("increase"),
        count(col("__inc")).as("n_deltas"),
        sum(col("__reset")).as("n_resets"))
      .withColumn("rate_per_sec",
        round(col("increase") / (bucketMs / 1000.0), 6))
  }

  /** The `*_over_time` family — per-sample sliding-window aggregations
    * over the trailing `windowMs` of the same series (PromQL's range
    * vectors: `sum/count/min/max/avg_over_time`), as ONE range-frame
    * window: `RANGE BETWEEN windowMs PRECEDING AND CURRENT ROW` over
    * `t`. Samples sharing a timestamp are frame peers in both engines,
    * so the result is well defined without a tiebreaker.
    *
    * Like [[increase]], this consumes a bucketed store scan with no
    * exchange (partitioned by `series_key`); the frame is bounded by
    * the window span, so state per open frame is O(window), not
    * O(series history). Determinism: min/max/count are exact; the
    * float sum is rounded (2dp) and the mean divides the *rounded* sum
    * by the exact count so both engines divide identical bits. */
  def overTime(samples: DataFrame, windowMs: Long): DataFrame = {
    val w = Window.partitionBy("series_key").orderBy("t")
      .rangeBetween(-windowMs, 0)
    samples.select(
      col("series_key"), col("t"), col("sample_id"),
      count(lit(1)).over(w).as("n_win"),
      min("v").over(w).as("min_win"), // exact: stored doubles, no rounding
      max("v").over(w).as("max_win"),
      round(sum("v").over(w), 2).as("sum_win"))
      .withColumn("avg_win", round(col("sum_win") / col("n_win"), 4))
  }
}
