package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counter increments — [[graft.query.Rate]]'s semantics as a
  * stateful stream. The batch operator derives each delta from a
  * series-partitioned `lag` window, i.e. a full re-sort of the corpus;
  * here the previous sample is O(#series) state (the same bound the
  * ingest validator and the reference's in-memory series map hold), so
  * each micro-batch emits its samples' increases incrementally and a
  * delta correctly spans the batch boundary. Downstream, a windowed sum
  * over `inc` is the live per-window rate — chained stateful operators
  * the engine supports natively in append mode.
  *
  * Counter semantics match the batch side: a drop is a reset and the
  * post-reset value is the increase. A sample at or below the series
  * high-water mark is dropped (the upstream [[StreamingIngest.validated]]
  * lane already routes those to reject statuses; this operator must not
  * double-count what a replay re-delivers). NaN on either side of a
  * delta yields no increase (a rate over NaN is undefined, not zero).
  */
object StreamingRate {

  final case class Increment(
      series_key: String, t: Long, v: Double,
      inc: Option[Double], reset: Boolean)

  final case class RateState(maxT: Long, lastV: Double)

  private[streaming] def incrementsForSeries(
      key: String,
      it: Iterator[StreamingIngest.Sample],
      state: GroupState[RateState]): Iterator[Increment] = {
    var st = state.getOption.getOrElse(RateState(Long.MinValue, Double.NaN))
    val out = it.toSeq.sortBy(s => (s.t, s.arrival)).flatMap { s =>
      if (s.t <= st.maxT) None // stale/duplicate: never re-counted
      else {
        val hasPrev = st.maxT != Long.MinValue
        val undefined = !hasPrev || st.lastV.isNaN || s.v.isNaN
        val reset = !undefined && s.v < st.lastV
        val inc =
          if (undefined) None
          else if (reset) Some(s.v)
          else Some(s.v - st.lastV)
        st = RateState(s.t, s.v)
        Some(Increment(key, s.t, s.v, inc, reset))
      }
    }
    state.update(st)
    out.iterator
  }

  /** Per-sample increases of a (validated) sample stream, keyed state
    * per series. Append-mode compatible: emits exactly once per
    * accepted sample. */
  def increments(
      samples: Dataset[StreamingIngest.Sample]): Dataset[Increment] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.series_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        incrementsForSeries)
  }

  /** One evaluated instant of a rule input: a per-(series, lattice
    * instant) value — [[StreamingIngest.streamingIncrease]]'s closed
    * buckets, a windowed rollup, or any other on-lattice stream. */
  final case class RuleInput(series_key: String, t: Long, value: Double)
  final case class AlertRow(series_key: String, t: Long, value: Double, state: String)
  final case class AlertSt(lastCondT: Long, run: Long)

  private[streaming] def alertForSeries(
      cond: Double => Boolean,
      forSteps: Int,
      stepMs: Long)(
      key: String,
      it: Iterator[RuleInput],
      state: GroupState[AlertSt]): Iterator[AlertRow] = {
    var st = state.getOption.getOrElse(AlertSt(Long.MinValue, 0L))
    val out = it.toSeq.sortBy(_.t).flatMap { r =>
      if (!cond(r.value)) {
        // inactive instant: the run breaks, nothing is emitted —
        // exactly the batch operator's where(cond)
        st = AlertSt(Long.MinValue, 0L)
        None
      } else {
        // a redelivered instant (at-least-once upstream) is idempotent:
        // same run, re-emitted verdict — it must NOT reset a firing
        // alert back to pending
        val run =
          if (st.lastCondT == r.t) st.run
          else if (st.lastCondT == r.t - stepMs) st.run + 1
          else 1L
        st = AlertSt(r.t, run)
        Some(AlertRow(key, r.t, r.value,
          if (run >= forSteps + 1) "firing" else "pending"))
      }
    }
    state.update(st)
    out.iterator
  }

  /** [[graft.query.Rules.alertState]] as a CONTINUOUS query — the
    * rules engine evaluated per micro-batch instead of per nightly
    * pass. Per-series state is one `(last condition-true instant,
    * run length)` pair: the batch operator's trailing RANGE frame
    * counts `forSteps + 1` present-and-true instants, which over an
    * on-lattice input is exactly an unbroken run of condition-true
    * instants `stepMs` apart — a stale (absent) or condition-false
    * instant resets the run, PromQL's pending-reset. Emitted rows are
    * final (the input's instants are; StreamingSpec pins the
    * differential against the batch operator on a micro-batch split).
    *
    * Input instants must arrive in nondecreasing `t` order per series
    * across batches — [[StreamingIngest.streamingIncrease]]'s
    * bucket-close order and any watermark-ordered rollup satisfy this;
    * within a batch the fold sorts, and a REDELIVERED instant (allowed
    * by at-least-once upstreams) is idempotent — it re-emits the same
    * verdict without resetting the run. State is one pair per active
    * series (the same O(#series) bound [[increments]] holds); like
    * there, dead-series expiry is the caller's TTL policy. */
  def streamingAlertState(
      rows: Dataset[RuleInput],
      cond: Double => Boolean,
      forSteps: Int,
      stepMs: Long): Dataset[AlertRow] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.series_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        alertForSeries(cond, forSteps, stepMs))
  }
}
