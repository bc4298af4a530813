package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.storage.BlockStore

/** The write path as Structured Streaming — the reference's single-writer
  * Head + WAL (SURVEY §2.9) recast:
  *
  *  - Appender transaction (`db.go:89-112`)  ≙ micro-batch: a batch is
  *    all-or-nothing visible once its `foreachBatch` write commits;
  *  - WAL + replay (`wal/wal.go`, `head.go:322-495`) ≙ the streaming
  *    checkpoint: exactly-once recovery is Spark's contract;
  *  - per-series out-of-order/amend rejection (`head.go:1680-1699`) ≙
  *    [[validated]] — `flatMapGroupsWithState` holding (maxT, lastV)
  *    per series. Unlike the batch [[graft.ingest.Appender]], this is
  *    the exact sequential semantic: a rejected sample does NOT advance
  *    the series high-water mark;
  *  - the `minValidTime` late-data bound (`head.go:773-783`, half a
  *    chunk range) ≙ the event-time watermark;
  *  - head→block persistence per chunk range (`db.go:617-665`) ≙
  *    partitionBy(t_bucket) parquet writes per micro-batch.
  *
  * State size is O(#series) — the same bound the reference's in-memory
  * series map has — and the state store shards it by series key across
  * executors.
  */
object StreamingIngest {

  final case class Sample(series_key: String, t: Long, v: Double, arrival: Long)
  final case class SeriesState(maxT: Long, lastV: Double)
  final case class Validated(series_key: String, t: Long, v: Double, arrival: Long, status: String)

  /** Sequentially validate one series' new samples against its running
    * state (reference `memSeries.appendable`, `head.go:1680-1699`). */
  private[streaming] def validateSeries(
      key: String,
      samples: Iterator[Sample],
      state: GroupState[SeriesState],
      minValidTime: Long): Iterator[Validated] = {
    var st = state.getOption.getOrElse(SeriesState(Long.MinValue, Double.NaN))
    val out = samples.toSeq.sortBy(_.arrival).map { s =>
      val status =
        if (s.t < minValidTime) "out_of_bounds"
        else if (st.maxT == Long.MinValue || s.t > st.maxT) {
          st = SeriesState(s.t, s.v); "ok"
        } else if (s.t == st.maxT) {
          // bitwise value equality incl. NaN payloads (head.go:1695-1697)
          if (java.lang.Double.doubleToRawLongBits(s.v) ==
            java.lang.Double.doubleToRawLongBits(st.lastV)) "ok"
          else "amend"
        } else "out_of_order"
      Validated(key, s.t, s.v, s.arrival, status)
    }
    state.update(st)
    out.iterator
  }

  /** Streaming validation operator: per-series state, exact sequential
    * semantics, state carried across micro-batches (≙ WAL replay
    * rebuilding series state on restart — the checkpoint restores it). */
  def validated(samples: Dataset[Sample], minValidTime: Long): Dataset[Validated] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.series_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Sample], state: GroupState[SeriesState]) =>
          validateSeries(key, it, state, minValidTime))
  }

  /** Ingest a stream into block storage: accepted samples only, bucketed
    * into block partitions per micro-batch (ST1 + ST4). Returns the
    * running query; stop it to "close" the appender. */
  def ingest(
      samples: Dataset[Sample],
      store: BlockStore,
      checkpointDir: String,
      minValidTime: Long): StreamingQuery = {
    import samples.sparkSession.implicits._
    validated(samples, minValidTime)
      .where($"status" === "ok")
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Validated], _: Long) =>
        store.write(batch.toDF().withColumnRenamed("arrival", "sample_id").drop("status"))
        ()
      }
      .start()
  }

  /** Windowed observability aggregation with a watermark — the
    * `rate()`-style rollup consumers build on the stream (ST3). */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      watermark: String = "1 hour",
      window_ : String = "6 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("series_key"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
}
