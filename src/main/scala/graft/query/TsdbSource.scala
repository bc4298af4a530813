package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.matchers.Matcher
import graft.sources.Tables

/** A time-series view over a wide source table.
  *
  * The reference's data model is the long format `(labels, t, v)`; a wide
  * analytics table maps onto it by declaring which columns carry the
  * timestamp, the value, and the labels. Keeping the *source* DataFrame
  * and per-label Columns (instead of materializing a `map` column first)
  * is what lets Catalyst push label matchers and the time range all the
  * way into the parquet scan — the Spark equivalent of the reference
  * resolving matchers entirely in its inverted index before touching
  * sample data (`querier.go:326-396`).
  *
  * @param labelCols label name -> value Column; NULL means the label is
  *                  absent on that series (≡ empty value, reference
  *                  `labels/labels.go:106-121`).
  */
final case class TsdbSource(
    raw: DataFrame,
    tCol: Column,
    vCol: Column,
    labelCols: Seq[(String, Column)],
    sampleId: Column,
    /** Closed time-range predicate in terms of a *physical* column so it
      * can be pushed into the scan; defaults to filtering on the derived
      * `tCol` expression (correct, but not pushdown-eligible). */
    tRange: Option[(Long, Long) => Column] = None) {

  /** Label-name -> value column, for matcher compilation. */
  private val resolve: String => Column = {
    val m = labelCols.toMap
    name => m.getOrElse(name, lit(null).cast("string"))
  }

  /** `map_concat` of per-label conditional singletons, NOT
    * `map_filter` over one big map: higher-order map functions
    * evaluate INTERPRETED per row, and this expression runs once per
    * source row in every labels-carrying query (measured r9: the
    * dominant per-row cost of the PromQL fill stages). `CreateMap` +
    * `map_concat` + `when` all stay inside whole-stage codegen;
    * insertion order is the static key sort, and absent/empty labels
    * contribute an empty map — output-identical to the filtered form. */
  private def labelsMap: Column =
    map_concat(labelCols.sortBy(_._1).map { case (k, c) =>
      val v = c.cast("string")
      when(v.isNotNull && v =!= "", map(lit(k), v))
        .otherwise(map().cast("map<string,string>"))
    }: _*)

  /** Canonical series key composed *statically*: the label names are
    * known at plan time, so the sort happens in Scala and the key is a
    * plain `concat_ws` over per-label fragments (null when the label is
    * absent/empty — concat_ws skips nulls). Identical output to
    * [[graft.functions.seriesKey]] over [[labelsMap]], but it stays in
    * whole-stage codegen: the generic form's map/array lambdas
    * (map_filter, array_sort, transform) evaluate interpreted, and this
    * expression runs once per source row in every query. */
  private def seriesKeyCol: Column = {
    val parts = labelCols.sortBy(_._1).map { case (k, c) =>
      val v = c.cast("string")
      when(v.isNotNull && v =!= "", concat(lit(k + "=\""), v, lit("\"")))
    }
    concat(lit("{"), concat_ws(",", parts: _*), lit("}"))
  }

  private def sampleCols: Seq[Column] = Seq(
    sampleId.cast("long").as("sample_id"),
    seriesKeyCol.as("series_key"),
    labelsMap.as("labels"),
    tCol.cast("long").as("t"),
    vCol.cast("double").as("v"))

  /** The long/narrow canonical projection:
    * `(sample_id, series_key, labels, t, v)`. */
  def samples: DataFrame = raw.select(sampleCols: _*)

  /** `Querier.Select(matchers, mint, maxt)` (reference `querier.go:214-230`):
    * compile matchers + closed time range against the *source* columns so
    * they reach the scan, then project to the long format.
    */
  def select(mint: Long, maxt: Long, matchers: Matcher*): DataFrame = {
    val time = tRange.getOrElse((lo: Long, hi: Long) => tCol >= lit(lo) && tCol <= lit(hi))
    val pred = Matcher.conjunction(matchers, resolve) && time(mint, maxt)
    copy(raw = raw.where(pred)).samples
  }

  /** [[select]] plus statically-resolved label value columns appended
    * under their label names. Reading a label back out of the `labels`
    * map (`col("labels")(name)`) routes through map_filter's interpreted
    * lambda per row; resolving the source column at plan time stays in
    * whole-stage codegen — the seriesKeyCol rationale, applied to
    * consumers that aggregate BY a label. */
  def selectWithLabels(
      mint: Long,
      maxt: Long,
      labelNames: Seq[String],
      matchers: Matcher*): DataFrame = {
    val time = tRange.getOrElse((lo: Long, hi: Long) => tCol >= lit(lo) && tCol <= lit(hi))
    val pred = Matcher.conjunction(matchers, resolve) && time(mint, maxt)
    raw.where(pred).select(
      sampleCols ++ labelNames.map(n => resolve(n).cast("string").as(n)): _*)
  }
}

object TsdbSource {

  /** The `events` table as a time series: one series per
    * (event_type, user), with a sparse `vip` label on every 10th user so
    * the absent-label matcher semantics have real data to bite on.
    * t = epoch ms, v = value. The physical `ts` encoding varies by
    * testdata generation (raw INT64 ns vs TIMESTAMP_NTZ µs —
    * [[Tables.tsMillis]]); the time-range predicate is expressed on the
    * physical column in its own type so it still reaches the scan.
    */
  def events(spark: SparkSession, sfDir: String): TsdbSource = {
    val df = Tables.events(spark, sfDir)
    val tsIsLong = df.schema("ts").dataType == org.apache.spark.sql.types.LongType
    TsdbSource(
      raw = df,
      tCol = Tables.tsMillis(df),
      vCol = col("value"),
      labelCols = Seq(
        "name" -> col("event_type"),
        "user" -> col("user_id").cast("string"),
        "vip" -> when(col("user_id") % 10 === 0, lit("1"))),
      sampleId = col("event_id"),
      // t = floor(ts/1ms), so [mint, maxt] in ms == [mint, maxt+1) on the
      // physical clock — expressed on the physical ts column for pushdown.
      tRange = Some { (mint, maxt) =>
        if (tsIsLong) {
          // raw ns: saturate — an open-ended ms range must not overflow
          val lo = if (mint <= Long.MinValue / 1000000L) Long.MinValue else mint * 1000000L
          val hi = if (maxt >= Long.MaxValue / 1000000L) Long.MaxValue else maxt * 1000000L + 999999L
          col("ts") >= lit(lo) && col("ts") <= lit(hi)
        } else {
          // TIMESTAMP_NTZ: closed [mint ms, maxt ms] == [mint*1000 µs,
          // maxt*1000+999 µs] as NTZ literals (UTC session). Outside the
          // NTZ-representable span (years 1..9999) the bound is vacuous.
          import java.time.{LocalDateTime, ZoneOffset}
          val MinMs = -62135596800000L   // 0001-01-01T00:00:00
          val MaxMs = 253402300799999L   // 9999-12-31T23:59:59.999
          def ntz(ms: Long, tailMicros: Long): Column =
            lit(LocalDateTime.ofEpochSecond(
              Math.floorDiv(ms, 1000L),
              (Math.floorMod(ms, 1000L) * 1000000L + tailMicros * 1000L).toInt,
              ZoneOffset.UTC))
          val lo = if (mint <= MinMs) lit(true) else col("ts") >= ntz(mint, 0L)
          val hi = if (maxt >= MaxMs) lit(true) else col("ts") <= ntz(maxt, 999L)
          lo && hi
        }
      })
  }
}
