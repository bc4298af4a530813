package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the query/storage/ingest layers.
  * All of these compose Spark built-ins (codegen'd, pushdown-friendly) —
  * no UDFs on the hot path.
  */
package object functions {

  /** Canonical series key `{k="v",k2="v2"}` from a `map<string,string>`
    * labels column: entries sorted by name, empty values dropped
    * (reference `labels/labels.go:35-58` invariants). Deterministic
    * regardless of map insertion order.
    */
  def seriesKey(labels: Column): Column =
    concat(
      lit("{"),
      array_join(
        transform(canonicalLabelEntries(labels),
          e => concat(e.getField("key"), lit("=\""), e.getField("value"), lit("\""))),
        ","),
      lit("}"))

  /** The canonical (sorted, empty-values-dropped) entry array of a
    * labels map — the representation [[seriesKey]] is built from, and
    * therefore the ONLY map image that is functionally dependent on
    * the series key (a raw map may still carry `k -> ""` entries that
    * identity ignores, reference head.go:832-833). Every entry-array
    * GROUPING KEY (the r12 SortAggregate-free label dedup/dim shape)
    * must group on THIS form, not on raw `map_entries`: grouping on the
    * raw entries splits a series across its empty-label variants. */
  def canonicalLabelEntries(labels: Column): Column =
    array_sort(map_entries(map_filter(labels, (_, v) => v.isNotNull && v =!= "")))

  /** 64-bit series identity hash over the canonical key. Uses Spark's
    * built-in xxhash64 (codegen'd); matches the reference's *choice* of
    * hash family (`labels/labels.go:61-71`) though not its exact bytes —
    * identity only needs to be deterministic and well-distributed for
    * partitioning.
    */
  def seriesHash(labels: Column): Column = xxhash64(seriesKey(labels))

  /** Exact reference-parity series identity hash (xxhash64 seed 0 over
    * `name\xff value\xff …`, `labels/labels.go:61-71`) via the native
    * codegen'd [[graft.catalyst.LabelsHash]] expression. Requires
    * [[graft.catalyst.GraftExtensions]] on the session (config
    * `spark.sql.extensions` or `GraftExtensions.install`).
    */
  def labelsHash(labels: Column): Column = call_function("labels_hash", labels)

  /** Block bucket for a timestamp: the half-open range `[bucket-width,
    * bucket)` it falls into, keyed by its exclusive upper bound — the
    * reference's `rangeForTimestamp` (`db.go:1198-1200`).
    */
  def rangeForTimestamp(t: Column, widthMs: Long): Column =
    (floor(t / widthMs) * widthMs + widthMs).cast("long")

  /** Scalar twin of [[rangeForTimestamp]] for typed/stateful operators
    * (floorDiv handles negative timestamps like SQL floor). */
  def rangeForTimestampMs(t: Long, widthMs: Long): Long =
    Math.floorDiv(t, widthMs) * widthMs + widthMs

  /** Clamp a closed interval to an enclosing range (reference
    * `clampInterval`, `block.go:648-656`). */
  def clampLo(x: Column, lo: Long): Column = greatest(x, lit(lo))
  def clampHi(x: Column, hi: Long): Column = least(x, lit(hi))
}
