package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.matchers.Matcher

/** The reference's postings machinery as relational set algebra: an
  * inverted-index table `(label_name, label_value, series_key)` — one
  * row per label pair per series (reference `index/index.go:140-147`,
  * postings lists keyed by label pair) — and `PostingsForMatchers`
  * (`querier.go:326-396`) compiled to joins:
  *
  *  - value-level matching runs on the index rows (one eval per distinct
  *    (series, pair), like the reference's per-value regex walk);
  *  - J2 Merge (OR over matching values) = the row filter itself;
  *  - J3 Without (matches-empty: series NOT carrying the label) =
  *    left_anti against the label's postings;
  *  - J1 Intersect (matcher conjunction) = left_semi chain;
  *  - the final fact-table touch is ONE semi-join on series_key.
  *
  * This is the complement to the pushdown path ([[TsdbSource.select]]):
  * pushdown wins when matchers map to scan filters; the postings path
  * wins when the matcher work is expensive per row (heavy regexes,
  * many-way unions) and #series ≪ #samples — the same trade the
  * reference makes by resolving matchers entirely in the index before
  * touching sample data.
  */
object Postings {

  /** Derive the inverted index from long-format samples (the persisted
    * form is materialized per block by [[graft.storage.BlockStore]]).
    * One row per series survives BEFORE the label-map explode: the key
    * is a function of the label set (graft.functions.seriesKey), so
    * every row of a series carries the same map and exploding all
    * sample rows first would shuffle #samples/#series times the data
    * for an identical result. */
  def fromSamples(samples: DataFrame): DataFrame =
    samples
      .select(col("series_key"), col("labels"))
      .dropDuplicates("series_key")
      // map keys are unique, so the explode output is already one
      // distinct row per (series, label pair) — no second shuffle
      .select(col("series_key"),
        explode(col("labels")).as(Seq("label_name", "label_value")))

  /** Series matched by one matcher, with the absent-label-is-empty rule
    * (`querier.go:331-396`): a matcher that matches "" also selects
    * every series without the label.
    *
    * Completeness caveat: `allSeries` must list every series in the
    * store. The postings index only knows series with ≥1 label, which
    * in the canonical key scheme means every key except the label-less
    * `"{}"` — callers that must honor the reference's absent-label rule
    * for it (reference test `TestNotMatcherSelectsLabelsUnsetSeries`,
    * `db_test.go:1165`) union a literal `"{}"` row into `allSeries`
    * ([[graft.storage.BlockStore.readRange]] does): selecting it is a
    * no-op when no such series exists, and exactly right when it does. */
  def seriesForOne(postings: DataFrame, allSeries: DataFrame, m: Matcher): DataFrame = {
    val p = postings.where(col("label_name") === m.name)
    val present = p
      .where(Matcher.toColumn(m, _ => col("label_value")))
      .select("series_key")
    if (m.matchesValue("")) {
      val withLabel = p.select("series_key")
      val absent = allSeries.join(withLabel, Seq("series_key"), "left_anti")
      present.unionByName(absent).distinct() // J2 merge of both branches
    } else present.distinct()
  }

  /** `PostingsForMatchers`: conjunction = J1 intersect = semi-join chain. */
  def seriesFor(postings: DataFrame, allSeries: DataFrame, ms: Seq[Matcher]): DataFrame =
    ms.map(seriesForOne(postings, allSeries, _))
      .reduceOption((a, b) => a.join(b, Seq("series_key"), "left_semi"))
      .getOrElse(allSeries)

  /** Full select through the index: resolve matchers to a series set,
    * then touch the fact table once (semi-join + time clamp).
    *
    * The index frame is consumed once per matcher branch (present +
    * absent sides) plus the all-series universe — up to ~2×matchers
    * subtrees. When it is DERIVED ad hoc ([[fromSamples]]: a full fact
    * scan + per-series dedup shuffle), re-running that derivation per
    * consumer is the dominant cost, so `select` materializes the index
    * once with an eager `localCheckpoint` (executor-local, lineage
    * severed — every branch reads the materialized rows, and the fact
    * source is scanned exactly once more for the final semi-join;
    * plan-asserted in PostingsSpec). The index is #series × #labels
    * rows — the smallest relation in the query by construction. A
    * store-persisted index (parquet dict) pays only a redundant small
    * copy.
    *
    * `broadcastKeys` hints the matched-series side for the common case
    * (#matched ≪ #samples). Pass `false` when the store's series count
    * makes the worst case (a broad matcher selecting everything)
    * non-broadcastable — AQE then picks the join strategy from runtime
    * sizes; [[graft.storage.BlockStore.readRange]] gates this from
    * manifest stats. */
  def select(
      samples: DataFrame,
      postings: DataFrame,
      mint: Long,
      maxt: Long,
      broadcastKeys: Boolean,
      ms: Matcher*): DataFrame = {
    val idx = postings.localCheckpoint()
    val allSeries = idx.select("series_key").distinct()
    val keys = seriesFor(idx, allSeries, ms)
    samples
      .join(if (broadcastKeys) broadcast(keys) else keys, Seq("series_key"), "left_semi")
      .where(col("t") >= lit(mint) && col("t") <= lit(maxt))
  }

  def select(
      samples: DataFrame,
      postings: DataFrame,
      mint: Long,
      maxt: Long,
      ms: Matcher*): DataFrame =
    select(samples, postings, mint, maxt, broadcastKeys = true, ms: _*)
}
