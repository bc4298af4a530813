package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, LongType}

/** Order-preserving `(t, v)` packing into one `DECIMAL(38,0)` so the
  * fills' latest-sample pick runs as `max(decimal)` in WHOLE-STAGE
  * HashAggregate instead of `max(struct(t, v))`, whose struct-typed
  * aggregation buffer Spark's UnsafeRow hash map cannot hold — every
  * staleness fill previously compiled to a partial SortAggregate that
  * SORTS the exploded candidates at sample grain (the BENCH_NOTES r11
  * "SortAggregate tax"; plan-verified partial SortAggregate → exchange
  * → final SortAggregate). Decimals of any precision ARE mutable
  * UnsafeRow buffer fields, so the same two-level (t, v) max becomes a
  * hash aggregate with no sort anywhere.
  *
  * Encoding: `(t + 2⁶²) · 2⁶⁴ + orderableBits(v)` where orderableBits
  * is the standard IEEE-754 total-order map (`b = doubleToLongBits(v);
  * b < 0 ? ~b : b | MIN_VALUE`, read as unsigned). Numeric decimal
  * order ≡ lexicographic ((t), Double.compare(v)) — t dominant because
  * the low word is non-negative and bounded by 2⁶⁴. Matches the struct
  * ordering it replaces: NaN greatest (doubleToLongBits canonicalizes
  * every NaN), −∞ least, and the only divergence is −0.0 < +0.0 where
  * Spark's numeric ordering ties them (a tie the struct max resolved
  * arbitrarily; the packed form is deterministic).
  *
  * Range: t ∈ [−2⁶², ~8.1·10¹⁷ ms] keeps the packed value inside 38
  * digits (10³⁸ > 2¹²⁶ budget: biased t < 10³⁸/2⁶⁴). Real corpora sit
  * ~2⁴¹; out-of-range t fails loudly rather than mis-ordering.
  */
object PackedTvKernel {
  final val BIAS = 1L << 62
  private val TWO64 = java.math.BigInteger.ONE.shiftLeft(64)
  private val MASK64 = TWO64.subtract(java.math.BigInteger.ONE)
  // floor((10^38 − 1) / 2^64): the largest biased t that still packs
  // inside DECIMAL(38, 0)
  private val MAX_TB = new java.math.BigInteger("99999999999999999999999999999999999999")
    .divide(TWO64).longValueExact()

  def pack(t: Long, v: Double): Decimal = {
    val tb = t + BIAS
    if (tb < 0 || tb > MAX_TB)
      throw new IllegalArgumentException(
        s"pack_tv: t=$t outside the packable range [-2^62, ${MAX_TB - BIAS}]")
    val b = java.lang.Double.doubleToLongBits(v)
    val u = if (b < 0) ~b else b | Long.MinValue
    val bi = java.math.BigInteger.valueOf(tb).shiftLeft(64)
      .or(java.math.BigInteger.valueOf(u).and(MASK64))
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  def unpackT(d: Decimal): Long =
    d.toJavaBigDecimal.toBigInteger.shiftRight(64).longValueExact() - BIAS

  def unpackV(d: Decimal): Double = {
    val u = d.toJavaBigDecimal.toBigInteger.and(MASK64).longValue()
    val b = if (u >= 0) ~u else u & Long.MaxValue
    java.lang.Double.longBitsToDouble(b)
  }
}

/** `pack_tv(t, v) → DECIMAL(38,0)` — see [[PackedTvKernel]]. */
final case class PackTv(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pack_tv"
  override def dataType: DataType = DecimalType(38, 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pack_tv requires (bigint, double), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override protected def nullSafeEval(t: Any, v: Any): Any =
    PackedTvKernel.pack(t.asInstanceOf[Long], v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, v) =>
      s"${ev.value} = graft.catalyst.PackedTvKernel.pack($t, $v);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackTv =
    copy(left = newLeft, right = newRight)
}

/** `packed_t(d) → bigint`: the t half of [[PackTv]]. */
final case class PackedT(child: Expression) extends UnaryExpression {
  override def prettyName: String = "packed_t"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DecimalType(38, 0)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_t requires decimal(38,0), got ${child.dataType.catalogString}")
  override protected def nullSafeEval(d: Any): Any =
    PackedTvKernel.unpackT(d.asInstanceOf[Decimal])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.catalyst.PackedTvKernel.unpackT($d)")
  override protected def withNewChildInternal(newChild: Expression): PackedT =
    copy(child = newChild)
}

/** `packed_v(d) → double`: the v half of [[PackTv]]. */
final case class PackedV(child: Expression) extends UnaryExpression {
  override def prettyName: String = "packed_v"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DecimalType(38, 0)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_v requires decimal(38,0), got ${child.dataType.catalogString}")
  override protected def nullSafeEval(d: Any): Any =
    PackedTvKernel.unpackV(d.asInstanceOf[Decimal])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.catalyst.PackedTvKernel.unpackV($d)")
  override protected def withNewChildInternal(newChild: Expression): PackedV =
    copy(child = newChild)
}
