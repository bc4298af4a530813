package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.matchers.{Eq, Matcher, Re}
import graft.query.TsdbSource
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the driver
  * uses as the correctness oracle at sf0.01. Column names and ordering are
  * aligned between the two on purpose (the driver hash-compares after
  * sorting columns by name).
  */
object SparkEntry {

  /** 2024-01-01T00:00:00Z in epoch ms — start of the events table's span. */
  private val T0 = 1704067200000L
  private val DAY = 86400000L
  /** Closed query range [Jan 2, Jan 16) used by the time-range queries. */
  private val MINT = T0 + DAY
  private val MAXT = T0 + 15 * DAY

  /** DuckDB rendering of the canonical series key for the events source —
    * must match [[graft.functions.seriesKey]] over
    * [[TsdbSource.events]]'s labels. */
  private val seriesKeySql =
    """'{name="' || event_type || '",user="' || user_id || '"' ||
      | CASE WHEN user_id % 10 = 0 THEN ',vip="1"' ELSE '' END || '}'""".stripMargin.replaceAll("\n", "")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_select_eq")(spark, "/root/testdata/sf0.001")

  /** Shared: the events table as a TsdbSource, selected and projected to
    * the output shape used by the ts_select_* queries. */
  private def tsSelect(s: SparkSession, dir: String, ms: Matcher*): DataFrame =
    TsdbSource.events(s, dir)
      .select(MINT, MAXT, ms: _*)
      .select(col("sample_id"), col("series_key"), col("t"), col("v"))
      .orderBy("sample_id")

  private def tsSelectSql(where: String): String =
    s"""SELECT event_id AS sample_id, $seriesKeySql AS series_key,
       | epoch_ms(ts) AS t, value AS v
       |FROM events
       |WHERE epoch_ms(ts) BETWEEN $MINT AND $MAXT AND ($where)
       |ORDER BY sample_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P10: equality matcher + closed time range, pushed to the scan.
    "ts_select_eq" -> ((s, dir) => tsSelect(s, dir, Eq("name", "click"))),

    // P2: anchored regex matcher (full-match semantics).
    "ts_select_regex" -> ((s, dir) => tsSelect(s, dir, Re("name", "c.*|sig.*"))),

    // P5/P7: negation with absent-label-matches semantics: vip != "1"
    // selects every series that does NOT carry the vip label.
    "ts_select_neq" -> ((s, dir) =>
      tsSelect(s, dir, Eq("name", "purchase"), Matcher.neq("vip", "1"))),

    // P5: empty-value equality selects series *without* the label.
    "ts_select_empty_eq" -> ((s, dir) =>
      tsSelect(s, dir, Eq("name", "error"), Eq("vip", ""))),

    // P8: regex-alternation → IN-list fast path (compiles to isin).
    "ts_select_set_regex" -> ((s, dir) =>
      tsSelect(s, dir, Re("name", "click|view|signup"))),

    // A1: distinct label names.
    "ts_label_names" -> ((s, dir) =>
      new graft.query.Querier(TsdbSource.events(s, dir).samples).labelNames()),

    // A2: distinct label values for one label.
    "ts_label_values" -> ((s, dir) =>
      new graft.query.Querier(TsdbSource.events(s, dir).samples).labelValues("name")),

    // A5: per-series min/max time + sample count.
    "ts_series_stats" -> ((s, dir) =>
      new graft.query.Querier(TsdbSource.events(s, dir).samples).seriesStats()),

    // A4: cardinality top-k (label,value) pairs.
    "ts_cardinality_topk" -> ((s, dir) =>
      new graft.query.Querier(TsdbSource.events(s, dir).samples).cardinalityTopK(10)),

    // TPC-H Q1 shape: scan + filter + hash aggregate (map-side partials).
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ts_select_eq" -> tsSelectSql("event_type = 'click'"),
    "ts_select_regex" -> tsSelectSql("regexp_full_match(event_type, 'c.*|sig.*')"),
    "ts_select_neq" -> tsSelectSql("event_type = 'purchase' AND NOT (user_id % 10 = 0)"),
    "ts_select_empty_eq" -> tsSelectSql("event_type = 'error' AND NOT (user_id % 10 = 0)"),
    "ts_select_set_regex" -> tsSelectSql("event_type IN ('click','view','signup')"),
    "ts_label_names" ->
      """SELECT label_name FROM (
        | SELECT DISTINCT unnest(['name','user'] || CASE WHEN user_id % 10 = 0 THEN ['vip'] ELSE [] END) AS label_name
        | FROM events)
        |ORDER BY label_name""".stripMargin,
    "ts_label_values" ->
      "SELECT DISTINCT event_type AS label_value FROM events ORDER BY label_value",
    "ts_series_stats" ->
      s"""SELECT $seriesKeySql AS series_key, min(epoch_ms(ts)) AS min_t,
         | max(epoch_ms(ts)) AS max_t, count(*) AS num_samples
         |FROM events GROUP BY 1 ORDER BY series_key""".stripMargin,
    "ts_cardinality_topk" ->
      """SELECT label_name, label_value, count(*) AS n FROM (
        | SELECT unnest(['name','user'] || CASE WHEN user_id % 10 = 0 THEN ['vip'] ELSE [] END) AS label_name,
        |        unnest([event_type, CAST(user_id AS VARCHAR)] || CASE WHEN user_id % 10 = 0 THEN ['1'] ELSE [] END) AS label_value
        | FROM events)
        |GROUP BY label_name, label_value
        |ORDER BY n DESC, label_name, label_value LIMIT 10""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
