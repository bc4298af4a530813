package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming native-histogram ingest —
  * [[graft.query.NativeHistogram.observe]] as a stateful stream. The
  * batch operator is ONE hash aggregate to `(series, t_bucket, schema,
  * part, idx)` grain; here the open bucket window is O(#series) state
  * (one sparse channel map per series — the same bound the ingest
  * validator and [[StreamingRate]] hold), each micro-batch folds its
  * samples into the open window, and a sample landing in a LATER bucket
  * closes the window and emits its channel rows — exactly the batch
  * operator's output grain, so `batch observe ≡ closed streaming
  * buckets` is a direct differential (StreamingSpec pins it across a
  * micro-batch split).
  *
  * Conventions mirror the batch operator bit for bit: the value axis
  * splits at the zero threshold (`|v| ≤ zt` → the zero bucket), the
  * bucket index is a `ceil(log2·2^s)` seed corrected against the EXACT
  * power-of-two boundaries (so the libm seed never decides a bucket),
  * and NaN observations DROP (the documented convention — they fit no
  * bucket and would corrupt every cumulative walk). Input is the
  * validated lane's per-series monotone stream; a sample at or below
  * the series high-water mark is dropped, never re-counted (replay
  * idempotence), and the final open bucket stays open until a later
  * sample closes it (an idle-TTL flush would follow
  * [[StreamingIngest.streamingIncrease]]'s watermark pattern).
  */
object StreamingHistogram {

  /** One CLOSED bucket channel row — the batch observe() grain.
    * `idx` is None on the zero bucket. */
  final case class HistBucketRow(
      series_key: String, t_bucket: Long, schema: Int,
      part: Int, idx: Option[Int], c: Long, sv: Double)

  /** Open-window state: the bucket being accumulated, the series
    * high-water mark, and the sparse channel map
    * (`"part:idx"` → (count, value sum)). */
  final case class HistState(
      bucket: Long, maxT: Long, chans: Map[String, (Long, Double)])

  /** Smallest `i` with `av ≤ 2^(i·2^−schema)` — the log2 seed plus one
    * exact ±1 correction, [[graft.query.NativeHistogram.bucketIdx]]'s
    * rule in JVM doubles. The boundary compare uses STRICTMATH pow:
    * Spark's `pow` expression is StrictMath-valued, while
    * `java.lang.Math.pow` is intrinsified (measured 1 ulp apart at
    * `2^−3.5`) — at positive schemas the boundaries are irrational, so
    * a value exactly ON a batch boundary double would bucket
    * differently here without the matching libm. (The log seed's libm
    * stays irrelevant: the correction compares against the exact
    * boundary.) */
  private[streaming] def bucketIdx(av: Double, schema: Int): Int = {
    val w = StrictMath.pow(2.0, -schema)
    def up(i: Int) = StrictMath.pow(2.0, i * w)
    val i0 = math.ceil(math.log(av) / math.log(2.0) / w).toInt // seed: ·2^s ≡ /w
    i0 + (if (up(i0) < av) 1 else 0) - (if (up(i0 - 1) >= av) 1 else 0)
  }

  private def chanKey(part: Int, idx: Option[Int]): String =
    s"$part:${idx.getOrElse("z")}"
  private def parseKey(k: String): (Int, Option[Int]) = {
    val Array(p, i) = k.split(":", 2)
    (p.toInt, if (i == "z") None else Some(i.toInt))
  }

  private def emitRows(
      key: String, schema: Int, st: HistState): Iterator[HistBucketRow] =
    st.chans.toSeq
      .map { case (k, (c, sv)) =>
        val (part, idx) = parseKey(k)
        HistBucketRow(key, st.bucket, schema, part, idx, c, sv)
      }
      .sortBy(r => (r.part, r.idx.getOrElse(Int.MinValue)))
      .iterator

  private[streaming] def observeForSeries(
      bucketMs: Long, schema: Int, zeroThreshold: Double,
      shift: Double)(
      key: String,
      it: Iterator[StreamingIngest.Sample],
      state: GroupState[HistState]): Iterator[HistBucketRow] = {
    var st = state.getOption.getOrElse(HistState(Long.MinValue, Long.MinValue, Map.empty))
    val out = Seq.newBuilder[HistBucketRow]
    it.toSeq.sortBy(s => (s.t, s.arrival)).foreach { s =>
      val vv = s.v + shift
      if (s.t > st.maxT && !vv.isNaN) {
        val b = graft.functions.rangeForTimestampMs(s.t, bucketMs)
        if (st.bucket != Long.MinValue && b > st.bucket) {
          out ++= emitRows(key, schema, st)
          st = HistState(b, st.maxT, Map.empty)
        }
        if (st.bucket == Long.MinValue) st = st.copy(bucket = b)
        // a sample whose bucket PRECEDES the open one would belong to an
        // already-emitted window; the monotone high-water guard above
        // makes that impossible (b is nondecreasing in t)
        val av = math.abs(vv)
        val (part, idx) =
          if (av <= zeroThreshold) (0, None)
          else if (vv > 0) (1, Some(bucketIdx(av, schema)))
          else (-1, Some(bucketIdx(av, schema)))
        val k = chanKey(part, idx)
        val (c0, sv0) = st.chans.getOrElse(k, (0L, 0.0))
        st = st.copy(maxT = s.t, chans = st.chans.updated(k, (c0 + 1, sv0 + vv)))
      } else if (s.t > st.maxT) {
        // NaN observation: drops from every bucket (the documented
        // convention) but still advances the high-water mark like the
        // validated lane accepted it
        st = st.copy(maxT = s.t)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Per-series streaming observation into native-histogram buckets.
    * Emits each bucket's channel rows exactly once, when a later-bucket
    * sample closes it. `shift` recentres observations like the batch
    * entries' `v − 35`. */
  def streamingObserve(
      samples: Dataset[StreamingIngest.Sample],
      bucketMs: Long,
      schema: Int,
      zeroThreshold: Double,
      shift: Double = 0.0): Dataset[HistBucketRow] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.series_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        observeForSeries(bucketMs, schema, zeroThreshold, shift))
  }
}
