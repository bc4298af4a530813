package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series-set merge semantics (reference `querier.go:533-667`,
  * `chunks/chunks.go:208-285`).
  *
  * In the long format, merging time-adjacent blocks ("chaining",
  * reference `chainedSeriesIterator`) is a plain `union` — order is
  * reimposed at the sink. Overlapping blocks additionally need sample
  * dedup where *the later block wins* on duplicate timestamps
  * (reference `verticalMergeSeriesIterator`, `querier.go:1039-1042`:
  * "the sample in a is discarded").
  *
  * Spark's union order is nondeterministic, so "later" must be an
  * explicit column: `block_seq`, a monotone block recency (ULID order /
  * ingest sequence in a real deployment). A further unique tie-break
  * (`sample_id`) makes the result reproducible even if one block
  * carries duplicate timestamps.
  *
  * Scale note: the dedup is one shuffle on (series_key) — the same key
  * the blocks are sorted by on disk, so with bucketed storage this
  * becomes a shuffle-free window.
  */
object Merge {

  /** Vertical merge: keep exactly one sample per (series_key, t), from
    * the highest `block_seq` (ties: highest `sample_id`). */
  def dedupLatest(
      samples: DataFrame,
      seqCol: String = "block_seq",
      tieBreak: String = "sample_id"): DataFrame = {
    val w = Window
      .partitionBy(col("series_key"), col("t"))
      .orderBy(col(seqCol).desc, col(tieBreak).desc)
    samples
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
