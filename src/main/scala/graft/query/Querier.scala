package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.matchers.Matcher

/** Query surface over the canonical long format
  * `(series_key string, labels map<string,string>, t long, v double, ...)`
  * — the reference's `Querier` interface (`querier.go:28-57`): select by
  * matchers + time range, enumerate label names/values, plus the
  * cardinality analysis of `cmd/tsdb/main.go:464-616`.
  *
  * This generic map-backed path serves ad-hoc frames that carry a
  * `labels` map column. [[graft.storage.BlockStore]] data is normalized
  * (labels live in the block's postings index) — query it through
  * `BlockStore.readRange(matchers...)` / `labelNames` / `labelValues`,
  * which resolve in the index. For wide source tables, prefer
  * [[TsdbSource.select]], which compiles matchers against the source
  * columns for parquet pushdown.
  */
final class Querier(val samples: DataFrame) {

  private val resolve: String => Column = name => col("labels").getItem(name)

  /** Matcher selection over a closed time range `[mint, maxt]`. */
  def select(mint: Long, maxt: Long, matchers: Matcher*): DataFrame =
    samples.where(
      Matcher.conjunction(matchers, resolve) &&
        col("t") >= lit(mint) && col("t") <= lit(maxt))

  /** Distinct label names, sorted (reference `querier.go:70-89`). */
  def labelNames(): DataFrame =
    samples
      .select(explode(map_keys(col("labels"))).as("label_name"))
      .distinct()
      .orderBy("label_name")

  /** Distinct values of one label, sorted (reference `querier.go:91-108`).
    * Series without the label contribute nothing (absent ≠ ""). */
  def labelValues(name: String): DataFrame =
    samples
      .select(col("labels").getItem(name).as("label_value"))
      .where(col("label_value").isNotNull)
      .distinct()
      .orderBy("label_value")

  /** Distinct values of one label among series matched by a selector —
    * the reference's `LabelValuesFor` (`querier.go:110-112`, declared
    * but `not implemented` there; this is the Prometheus
    * label-values-with-matchers endpoint consumers actually call).
    * One scan: the matcher conjunction compiles to a predicate, so
    * pushdown-capable sources prune before the distinct. */
  def labelValuesFor(name: String, matchers: Matcher*): DataFrame =
    samples
      .where(Matcher.conjunction(matchers, resolve))
      .select(col("labels").getItem(name).as("label_value"))
      .where(col("label_value").isNotNull)
      .distinct()
      .orderBy("label_value")

  /** Distinct series, as canonical keys, in label-set order — the sorted
    * SeriesSet invariant (reference `querier.go:519-524`). */
  def series(): DataFrame =
    samples.select(col("series_key")).distinct().orderBy("series_key")

  /** Top-k (label name, value) pairs by sample frequency — the `tsdb
    * analyze` cardinality report (reference `cmd/tsdb/main.go:464-616`).
    * Deterministic tie-break on (name, value). */
  def cardinalityTopK(k: Int): DataFrame =
    samples
      .select(explode(col("labels")).as(Seq("label_name", "label_value")))
      .groupBy("label_name", "label_value")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label_name"), col("label_value"))
      .limit(k)

  /** Counter increase/rate per `(series, bucket)` — see [[Rate.increase]]. */
  def rate(bucketMs: Long): DataFrame = Rate.increase(samples, bucketMs)

  /** Trailing-window `*_over_time` aggregates — see [[Rate.overTime]]. */
  def overTime(windowMs: Long): DataFrame = Rate.overTime(samples, windowMs)

  /** le-bucket φ-quantile per `(series, bucket)` — see [[Histogram.quantile]]. */
  def histogramQuantile(bucketMs: Long, les: Seq[Double], phi: Double): DataFrame =
    Histogram.quantile(samples, bucketMs, les, phi)

  /** Downsampling — the rollup maintenance job a 100 TB metric store
    * runs beyond the reference's raw-resolution-only storage (the
    * Thanos/M3 pattern): per `(series, step)` the five standard rollup
    * aggregates — count, sum, min, max, last — from which every
    * consumer function stays computable at the coarser resolution
    * (avg = sum/count, rate from last, bounds from min/max). ONE
    * map-side-combined hash aggregate; `last` rides a struct-max keyed
    * `(t, sample_id, v)` so ties are deterministic. The output is
    * itself a valid samples frame (`t` = step boundary, `v` = last,
    * `sample_id` = the group's max, still globally unique), so it
    * writes straight back into a coarser [[graft.storage.BlockStore]]
    * and is queried by the same machinery — QuerierSpec round-trips
    * exactly that. */
  def downsample(stepMs: Long): DataFrame =
    samples
      .groupBy(col("series_key"),
        graft.functions.rangeForTimestamp(col("t"), stepMs).as("t"))
      .agg(
        max("sample_id").as("sample_id"),
        // flat-slot pick (HashAggregate) ≡ max(struct): (t, sample_id)
        // is already unique, so the 2-level key decides identically
        graft.catalyst.ArgPick.pick(max = true, Seq(
          "__t" -> col("t"), "sample_id" -> col("sample_id"),
          "v" -> col("v")))
          .getField("v").as("v"),
        count(lit(1)).as("n"),
        round(sum("v"), 2).as("sum_v"),
        min("v").as("min_v"),
        max("v").as("max_v"))

  /** Per-series sample-span stats — min/max time maintenance (reference
    * `head.go:301-320`) and block-stats accumulation (`compact.go:827-831`). */
  def seriesStats(): DataFrame =
    samples
      .groupBy("series_key")
      .agg(
        min(col("t")).as("min_t"),
        max(col("t")).as("max_t"),
        count(lit(1)).as("num_samples"))
      .orderBy("series_key")
}
