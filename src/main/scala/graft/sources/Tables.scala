package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  * One parquet file per table under `<sfDir>/<name>.parquet`.
  */
object Tables {

  /** Epoch-ms Column for the events `ts` column, adaptive to the two
    * on-disk encodings the driver has generated across rounds:
    * INT64 TIMESTAMP(NANOS) (Spark reads a raw long via the
    * `nanosAsLong` legacy flag) and TIMESTAMP(MICROS) (Spark reads
    * TIMESTAMP_NTZ). The NTZ branch diffs against the NTZ epoch —
    * session-timezone-INDEPENDENT, unlike a cast through TIMESTAMP —
    * interpreting the stored wall clock as UTC exactly like DuckDB's
    * `epoch_ms(ts)` on the same file, whatever session the caller
    * supplies. */
  def tsMillis(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000000") // raw ns -> ms, exact
    case _ => expr(
      "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 1000")
  }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet INT64 TIMESTAMP(NANOS) which Spark's µs
      // TimestampType cannot hold; read it as a raw long (ns since epoch).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = read(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = read(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = read(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = read(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = read(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = read(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
