package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Label-set loader (S15, reference `labels.ReadLabels`,
  * `labels/labels.go:191-233`): newline-delimited JSON objects
  * `{"name":"value",...}`, one label set per line, loaded into the
  * canonical form — empty values dropped, keys sorted into the series
  * key, duplicate sets removed — ready to drive synthetic series
  * benchmarks the way the reference's 20k-label-set corpus does.
  */
object LabelSets {

  /** Load up to `limit` label sets (all by default). Output:
    * `(labels map<string,string>, series_key string, series_hash long)`,
    * one row per distinct label set. */
  def readJson(spark: SparkSession, path: String, limit: Int = Int.MaxValue): DataFrame = {
    val raw = spark.read.text(path).where(length(trim(col("value"))) > 0)
    val lim = if (limit == Int.MaxValue) raw else raw.limit(limit)
    lim
      .select(from_json(col("value"), MapType(StringType, StringType)).as("parsed"))
      .where(col("parsed").isNotNull)
      .select(
        map_filter(col("parsed"), (_, v) => v.isNotNull && v =!= "").as("labels"))
      .withColumn("series_key", graft.functions.seriesKey(col("labels")))
      .withColumn("series_hash", graft.functions.seriesHash(col("labels")))
      // entry-array distinct, not dropDuplicates("series_key"): the
      // subset form buffers first(labels map) — a partial SortAggregate
      // over the whole corpus; the var-length grouping KEY stays in
      // HashAggregate (series_key/series_hash are derived from labels,
      // so grouping by all three is the same dedup)
      .select(col("series_key"), col("series_hash"),
        graft.functions.canonicalLabelEntries(col("labels")).as("__le"))
      .distinct()
      .select(map_from_entries(col("__le")).as("labels"),
        col("series_key"), col("series_hash"))
  }
}
