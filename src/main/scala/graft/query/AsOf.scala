package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row at or before
  * its timestamp within a lookback horizon, per join key — the
  * cross-series alignment PromQL binary ops need (join a series to the
  * most recent observation of another; the reference exposes exactly
  * the per-series iterator + seek surface this consumes,
  * `querier.go:50-57`), and the canonical time-series/point-in-time
  * enrichment operator relational engines lack.
  *
  * Spark has no ASOF JOIN; the naive encodings both fail at scale — a
  * range θ-join explodes to |L|·|R| per key before filtering, and a
  * per-left-row subquery never distributes. The scalable shape is
  * union + running `last_value`:
  *
  *   1. tag sides and union (right rows carry only key/t/value);
  *   2. ONE window per key ordered by `(t, side)` — right sorts before
  *      left at equal t, so a same-timestamp observation is visible,
  *      matching PromQL's same-instant vector matching;
  *   3. running `last(..., ignoreNulls)` fills each left row with the
  *      most recent right `(t, v)`;
  *   4. fills older than `lookbackMs` null out (the match that WOULD
  *      have won is too old ⇒ no in-window match exists at all).
  *
  * Cost: one shuffle+sort of |L|+|R| rows on the key — the same plan
  * class as any windowed read here, no blowup, AQE-skew-splittable.
  * The running fill is O(1) state per open partition.
  *
  * Requirement: `right` must be unique per `(keys, t)` (pre-aggregate
  * otherwise) — with duplicates, "the" same-instant row is undefined.
  * EXCEPTION: [[gridLatest]] (and [[latestPerInstant]]) contractually
  * resolve duplicates to the max value at the latest in-window t (its
  * `max(struct(t, v))` IS the two-level max), so callers may feed raw
  * sample rows — `ts_grid_eval`/`ts_offset` and the by-label family
  * rely on this, pinned by AsOfSpec's duplicate-t fixture.
  */
object AsOf {

  /** Left rows + `(r_t, r_v)` from the latest in-window right match,
    * null when none. `right` needs columns `keys :+ t :+ r_v`.
    *
    * `ranged = true` applies the `Rate.seriesOrdered` pricing to the
    * union: ONE hash exchange on the keys + the window's in-partition
    * sort, priced explicitly instead of a hash exchange now and a
    * global orderBy (whose range-sampling job re-runs the window
    * stage) later — the fill's output arrives key-clustered and
    * t-ordered within, so sample-scale consumers finish with
    * `sortWithinPartitions`. */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lookbackMs: Long,
      ranged: Boolean = false): DataFrame =
    joinMany(left, Seq("r" -> right), keys, lookbackMs, ranged)

  /** One right relation carrying SEVERAL value columns, each filled
    * independently: a row where `valueCols(i)` is null does NOT clobber
    * column i's running fill (the conditional-struct guard includes the
    * value's non-nullness). This is the shape for operands that pivot
    * out of one aggregate — e.g. `max(v) FILTER (type='click')` and
    * `...'purchase'` per (key, t) — so a PromQL binary op costs ONE
    * fact aggregate + ONE union-window, instead of one aggregate and
    * one union per operand ([[joinMany]]'s shape for genuinely separate
    * relations). Output columns: `<c>_t` / `<c>_v` per value column. */
  def joinWide(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lookbackMs: Long,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "joinWide needs at least one value column")
    val unioned = left.withColumn("__side", lit(1)).unionByName(
      right.select((keys.map(col) :+ col("t")) ++
        valueCols.map(c => col(c).as(s"__w_$c")): _*)
        .withColumn("__side", lit(0)),
      allowMissingColumns = true)
    fillAsOf(unioned, keys, lookbackMs, leftSide = 1,
      fills = valueCols.map(c =>
        (c, col("__side") === 0 && col(s"__w_$c").isNotNull, col(s"__w_$c"))))
      .drop(valueCols.map(c => s"__w_$c"): _*)
  }

  /** N-ary as-of: every right side resolved against the SAME left in
    * ONE union + window pass — N running `last` fills over one window
    * spec collapse into a single Window operator, so the plan pays one
    * shuffle+sort of `|L| + Σ|Rᵢ|` total, not one per side. This is
    * what a PromQL binary/ternary op wants: align every operand to the
    * evaluation instants in one pass, then do arithmetic
    * ([[graft.SparkEntry]]'s `ts_binary_op`).
    *
    * Each right needs `keys :+ t :+ r_v`; its columns come back as
    * `<name>_t` / `<name>_v` (nulled outside the lookback). All rights
    * sort before left at equal `t` (same-instant visibility). */
  def joinMany(
      left: DataFrame,
      rights: Seq[(String, DataFrame)],
      keys: Seq[String],
      lookbackMs: Long,
      ranged: Boolean = false): DataFrame = {
    require(rights.nonEmpty && rights.map(_._1).distinct.size == rights.size,
      "right sides need distinct names")
    val n = rights.size
    val unioned0 = rights.zipWithIndex.foldLeft(left.withColumn("__side", lit(n))) {
      case (acc, ((_, r), i)) =>
        acc.unionByName(
          r.select(keys.map(col) :+ col("t") :+ col("r_v").as(s"__rv_$i"): _*)
            .withColumn("__side", lit(i)),
          allowMissingColumns = true)
    }
    // see [[join]]: hash partitioning on the keys satisfies the fill
    // window's clustering without a range exchange's bounds-sampling
    // pass over the union lineage
    val unioned =
      if (!ranged) unioned0
      else unioned0.repartition(keys.map(col): _*)
        .sortWithinPartitions((keys :+ "t" :+ "__side").map(col): _*)
    fillAsOf(unioned, keys, lookbackMs, leftSide = n,
      fills = rights.zipWithIndex.map { case ((name, _), i) =>
        (name, col("__side") === i, col(s"__rv_$i"))
      })
      .drop(rights.indices.map(i => s"__rv_$i"): _*)
  }

  /** Grid evaluation fast path for `lookback < step` — the regime where
    * the general union-window ([[join]]) is overkill: a right row at
    * `rt` can satisfy at most ONE grid instant (its ceil boundary
    * `g = ⌈rt⌉_step`, and only when `rt >= g - lookback`), so the fill
    * is a per-(key, instant) latest-row aggregate — map-side combined,
    * no sort over the sample-scale union — joined to the instant grid.
    * At 100 TB this replaces a shuffle+sort of |samples|+|grid| rows
    * with one combine-shrunk aggregate plus a grid-sized join.
    *
    * Exact [[join]] semantics: inclusive horizon (`rt >= g - lookback`),
    * same-instant rows visible (`rt = g` maps to `g`), latest `rt` wins.
    * Unlike the other as-of variants, `right` need NOT be unique per
    * (keys, t): duplicates contractually resolve to the max value at
    * the latest t (`max(struct(t, v))` is a two-level max) — identical
    * to feeding the per-(keys, t) max(v) pre-aggregate, without its
    * shuffle. Callers (`ts_grid_eval`, `ts_offset`, the by-label
    * family) pass raw sample rows relying on exactly this.
    * The strict `lookback < step` bound matters: at `lookback = step` a
    * boundary-exact sample satisfies TWO instants and the general path
    * must be used.
    *
    * `grid` must be the `keys × instants` frame (instant column `t`),
    * and every instant must sit on the step lattice `originMs + k·step`
    * — the ceil-boundary mapping is computed against that lattice, so a
    * phase-offset grid (e.g. anchored at a query start that is not a
    * step multiple) MUST pass its anchor as `originMs` or every fill
    * comes back null. Output = grid columns + `<name>_t`/`<name>_v`,
    * null when no sample is inside the instant's staleness window —
    * identical schema to [[join]]'s output on the same grid. */
  def gridLatest(
      grid: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      stepMs: Long,
      lookbackMs: Long,
      name: String = "r",
      originMs: Long = 0L): DataFrame =
    grid.join(
      latestPerInstant(right, keys, stepMs, lookbackMs, name, originMs),
      keys :+ "t", "left")

  /** Sparse grid fill for `lookback ≥ step` — the regime
    * [[gridLatest]]'s single-instant mapping can't cover (a sample may
    * satisfy several instants). Candidate-explode formulation: each
    * sample can serve at most `⌈lookback/step⌉ + 1` lattice instants,
    * so explode it to exactly those, apply the inclusive horizon, and
    * take ONE map-side-combined latest-non-null aggregate per
    * `(keys, instant, value column)`. No lattice materialization, no
    * window sort, no join — a single exchange whose input is already
    * combine-shrunk to per-(key, instant) structs.
    *
    * vs [[joinWide]] on a dense grid: the union window shuffles AND
    * sorts `|keys|·|instants| + |samples|` rows; this moves
    * `≤ (k+1)·|samples|` pre-combine rows and never materializes empty
    * grid cells — the right trade whenever series are sparse relative
    * to the instant lattice, and never worse by more than the small
    * constant k at 100 TB densities.
    *
    * Output is the NON-EMPTY fill frame only: `keys`, `t` on the
    * `[mint, maxt]` step lattice (instants with at least one in-horizon
    * row), `<c>_t`/`<c>_v` per value column (null when that column has
    * no in-horizon non-null row at the instant). Consumers that need
    * the all-null grid cells re-attach a lattice afterwards — the same
    * contract [[latestPerInstant]] gives the by-label family. Fill
    * semantics otherwise match [[joinWide]]: inclusive horizon,
    * same-instant visibility, per-column independence, duplicates
    * resolved to the max value at the latest t. */
  def gridFillWide(
      right: DataFrame,
      keys: Seq[String],
      mintMs: Long,
      maxtMs: Long,
      stepMs: Long,
      lookbackMs: Long,
      valueCols: Seq[String],
      carryCols: Seq[String] = Nil): DataFrame = {
    require(stepMs > 0 && lookbackMs >= stepMs,
      s"gridFillWide is the lookback >= step regime ($lookbackMs < $stepMs): use gridLatest")
    val k = ((lookbackMs + stepMs - 1) / stepMs).toInt
    val g0 = (floor((col("t") - 1 - mintMs) / stepMs) * stepMs + stepMs + mintMs)
      .cast("long")
    // carryCols: per-key-constant payloads (a labels map) that ride the
    // same aggregate as `first` — saves the caller a source re-scan and
    // a key-scale join to re-attach them.
    // DOUBLE value columns take the packed-decimal max
    // ([[graft.catalyst.PackedTvKernel]]): max(DECIMAL(38,0)) runs in
    // whole-stage HashAggregate where the struct max forced a partial
    // SortAggregate over the exploded candidates — the fill keeps its
    // exact (latest t, max v, nulls skipped) semantics and loses the
    // sample-grain sort. Non-double payloads (a mixed (v, h) struct)
    // keep the struct max.
    val packed = valueCols.filter(c => right.schema(c).dataType ==
      org.apache.spark.sql.types.DoubleType).toSet
    val aggs = valueCols.map(c =>
      if (packed(c))
        max(when(col(c).isNotNull, packTV(col("t"), col(c)))).as(s"__m_$c")
      else
        max(when(col(c).isNotNull, struct(col("t").as("t"), col(c).as("v"))))
          .as(s"__m_$c")) ++
      carryCols.map(c => first(col(c)).as(c))
    val candidates = right
      .withColumn("__g", explode(sequence(g0, g0 + k.toLong * stepMs, lit(stepMs))))
      .where(col("__g").between(mintMs, maxtMs) &&
        col("t") >= col("__g") - lookbackMs)
    valueCols.foldLeft(
      candidates
        .groupBy(keys.map(col) :+ col("__g"): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumnRenamed("__g", "t")) { case (acc, c) =>
      if (packed(c))
        acc.withColumn(s"${c}_t", packedT(col(s"__m_$c")))
          .withColumn(s"${c}_v", packedV(col(s"__m_$c")))
      else
        acc.withColumn(s"${c}_t", col(s"__m_$c.t"))
          .withColumn(s"${c}_v", col(s"__m_$c.v"))
    }.drop(valueCols.map(c => s"__m_$c"): _*)
  }

  /** [[graft.catalyst.PackTv]] and friends as Columns. */
  private def packTV(t: Column, v: Column): Column =
    org.apache.spark.sql.graft.bridge.columnFn {
      case Seq(a, b) => graft.catalyst.PackTv(a, b)
    }(t, v)
  private def packedT(d: Column): Column =
    org.apache.spark.sql.graft.bridge.columnFn {
      case Seq(a) => graft.catalyst.PackedT(a)
    }(d)
  private def packedV(d: Column): Column =
    org.apache.spark.sql.graft.bridge.columnFn {
      case Seq(a) => graft.catalyst.PackedV(a)
    }(d)

  /** The latest-sample half of [[gridLatest]], exposed for callers whose
    * aggregate never needs the grid's null rows (the by-label family):
    * one map-side-combined aggregate mapping each right row to its ceil
    * instant on the `originMs + k·step` lattice, keeping the closed
    * window `[g - lookback, g]`, resolving duplicates to the max value
    * at the latest t. Output: `keys :+ t :+ <name>_t :+ <name>_v` —
    * gridLatest's non-null rows exactly. */
  def latestPerInstant(
      right: DataFrame,
      keys: Seq[String],
      stepMs: Long,
      lookbackMs: Long,
      name: String = "r",
      originMs: Long = 0L,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(lookbackMs < stepMs,
      s"latestPerInstant needs lookback < step ($lookbackMs >= $stepMs): use join()")
    val g = (floor((col("t") - 1 - originMs) / stepMs) * stepMs + stepMs + originMs)
      .cast("long")
    // double r_v: packed-decimal max (HashAggregate, no sort — see
    // [[gridFillWide]]); null r_v rows are skipped (real callers feed
    // non-null sample values; the duplicate-resolution contract is
    // about non-null rows). Struct payloads (the mixed (v, h) fill)
    // keep the struct max.
    val pack = right.schema("r_v").dataType ==
      org.apache.spark.sql.types.DoubleType
    val aggs = (if (pack)
        max(when(col("r_v").isNotNull, packTV(col("t"), col("r_v")))).as("__m")
      else max(struct(col("t").as("t"), col("r_v").as("v"))).as("__m")) +:
      carryCols.map(c => first(col(c)).as(c))
    val agged = right
      .withColumn("__g", g)
      .where(col("t") >= col("__g") - lookbackMs)
      .groupBy(keys.map(col) :+ col("__g"): _*)
      .agg(aggs.head, aggs.tail: _*)
    val (mt, mv) =
      if (pack) (packedT(col("__m")), packedV(col("__m")))
      else (col("__m.t"), col("__m.v"))
    agged.select(keys.map(col) ++ Seq(col("__g").as("t"),
        mt.as(s"${name}_t"), mv.as(s"${name}_v")) ++
        carryCols.map(col): _*)
  }

  /** The shared mechanics every as-of variant delegates to: one window
    * per key ordered `(t, __side)` over the pre-built union, one running
    * `last(when(cond, struct(t, value)))` per fill, the lookback mask,
    * and the left-row projection. `fills` = (output name, source-row
    * predicate, value expression). */
  private def fillAsOf(
      unioned: DataFrame,
      keys: Seq[String],
      lookbackMs: Long,
      leftSide: Int,
      fills: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy("t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fills.foldLeft(unioned) { case (acc, (name, cond, value)) =>
      acc.withColumn(s"__r_$name",
        last(when(cond, struct(col("t"), value.as("v"))), ignoreNulls = true).over(w))
    }
    val out = fills.foldLeft(filled.where(col("__side") === leftSide)) {
      case (acc, (name, _, _)) =>
        val ok = col(s"__r_$name.t") >= col("t") - lookbackMs
        acc
          .withColumn(s"${name}_t", when(ok, col(s"__r_$name.t")))
          .withColumn(s"${name}_v", when(ok, col(s"__r_$name.v")))
    }
    out.drop("__side" +: fills.map(f => s"__r_${f._1}"): _*)
  }
}
