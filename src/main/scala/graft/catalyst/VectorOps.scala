package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Static kernels for the vector expressions — plain object (Java
  * static methods) so generated code calls them without reflection.
  *
  * Null/length semantics mirror the `zip_with` + `aggregate` fold they
  * replace EXACTLY: a length mismatch (zip_with pads with nulls) or a
  * null element poisons the whole sum to SQL NULL; summation is
  * left-to-right by ascending index starting from +0.0 (an exact
  * identity under IEEE addition), and each float widens to double the
  * same way the fold's cast does — so results are bit-identical and
  * every oracle hash is unaffected.
  */
object VectorKernels {
  /** Element type codes: 0 = float, 1 = double, 2 = int, 3 = long —
    * each widens to double exactly like the fold's cast (int/long are
    * exact within 2⁵³; the corpora's int8 codes are far inside). */
  final val FLOAT = 0; final val DOUBLE = 1; final val INT = 2; final val LONG = 3

  @inline private def get(a: ArrayData, i: Int, t: Int): Double = t match {
    case FLOAT => a.getFloat(i).toDouble
    case DOUBLE => a.getDouble(i)
    case INT => a.getInt(i).toDouble
    case _ => a.getLong(i).toDouble
  }

  /** Σ a_i·b_i, or null per the poisoning rule above. Boxed return so
    * null is representable; the hot loop inside is primitive. */
  def dot(a: ArrayData, b: ArrayData, aT: Int, bT: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, aT) * get(b, i, bT)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Product-quantization encode: for each of the `cb.length`
    * contiguous subspaces, the argmin-squared-L2 codebook entry —
    * distances rounded (4dp, HALF_UP — Spark's `round`) BEFORE the
    * argmin and ties resolved to the lowest code, exactly the
    * `array_min(array(struct(round(l2sq…), code)…))` expression tree
    * this fuses (same subtraction/summation order, so the selected
    * codes are bit-identical). One primitive loop per row instead of
    * m × ksub Catalyst struct/array nodes. Null element or a vector
    * shorter than m × subdim poisons the whole row to NULL. */
  def pqEncode(a: ArrayData, cb: Array[Array[Array[Double]]], aT: Int): ArrayData = {
    val m = cb.length
    val subdim = cb(0)(0).length
    if (a.numElements() < m * subdim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subdim
      val entries = cb(s)
      var best = Double.MaxValue
      var bestCode = 0
      var c = 0
      while (c < entries.length) {
        val ce = entries(c)
        var acc = 0.0
        var d = 0
        while (d < subdim) {
          if (a.isNullAt(base + d)) return null
          val x = get(a, base + d, aT) - ce(d)
          acc += x * x
          d += 1
        }
        // Spark's Round passes NaN/Inf through (BigDecimal would throw)
        val r =
          if (java.lang.Double.isNaN(acc) || java.lang.Double.isInfinite(acc)) acc
          else java.math.BigDecimal.valueOf(acc)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if (java.lang.Double.compare(r, best) < 0) { best = r; bestCode = c }
        c += 1
      }
      codes(s) = bestCode
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** IVF coarse assignment: the max-cosine centroid (sims rounded 4dp
    * HALF_UP before the argmax, ties to the LOWEST centroid id) —
    * fusing the `array_max(array(struct(round(dot/(nrm·cnrm)), −id,
    * id)…))` tree bit-for-bit: same dot summation order, the row norm
    * is the same Σx² fold, comparisons use Spark's double order
    * (−0.0 ≡ 0.0, NaN greatest). Returns `(centroid_id, sim)`; null
    * element poisons the row, and a centroid/vector length mismatch
    * (impossible on real corpora — the old tree produced a null-sim
    * struct there) poisons it loudly too. */
  def nearestCentroid(
      a: ArrayData,
      ids: Array[Long],
      ces: Array[Array[Double]],
      cNrms: Array[Double],
      aT: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    var i = 0
    var ss = 0.0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = get(a, i, aT)
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    var best = Double.NegativeInfinity
    var bestId = -1L
    var c = 0
    while (c < ids.length) {
      val ce = ces(c)
      if (ce.length != n) return null
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += get(a, d, aT) * ce(d)
        d += 1
      }
      val q = acc / (nrm * cNrms(c))
      // Spark's Round passes NaN/Inf through (BigDecimal would throw)
      var r =
        if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) q
        else java.math.BigDecimal.valueOf(q)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r == 0.0) r = 0.0 // normalize -0.0 like Spark's ordering
      // strictly-greater + ascending ids == max sim, tie lowest id;
      // Double.compare puts NaN greatest, matching struct ordering.
      // First-iteration flag is the INDEX, not the sign of bestId —
      // caller-supplied centroid ids may legitimately be negative.
      if (c == 0 || java.lang.Double.compare(r, best) > 0) {
        best = r; bestId = ids(c)
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestId, best)
  }

  /** Σ (a_i−b_i)², same semantics as [[dot]]. */
  def l2sq(a: ArrayData, b: ArrayData, aT: Int, bT: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = get(a, i, aT) - get(b, i, bT)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Shared scaffold for the two binary vector expressions: float/double
  * array children in any mix, double result, custom null handling (the
  * kernel decides null, not just child nullability).
  *
  * A native codegen'd `Expression` rather than the higher-order
  * `zip_with`+`aggregate` composition because the latter evaluates
  * INTERPRETED with per-element boxing — measured as THE per-pair
  * constant of every ANN candidate join (the corpus-scale kNN graph,
  * near-dup pairs, centroid assignment). The kernel loop is a single
  * static call from generated code: no lambda dispatch, no boxing, no
  * intermediate array.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => VectorKernels.FLOAT
    case ArrayType(DoubleType, _) => VectorKernels.DOUBLE
    case ArrayType(IntegerType, _) => VectorKernels.INT
    case ArrayType(LongType, _) => VectorKernels.LONG
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left.dataType) >= 0 && elemCode(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double|int|bigint> columns, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def kernel: String // static method name on VectorKernels
  private lazy val leftT = elemCode(left.dataType)
  private lazy val rightT = elemCode(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (kernel == "dot")
      VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftT, rightT)
    else
      VectorKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftT, rightT)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecRes")
      s"""
         |java.lang.Double $r = graft.catalyst.VectorKernels.$kernel(
         |  $a, $b, $leftT, $rightT);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

/** PQ encode as ONE fused expression: `codes = pq_encode(embedding)`
  * over an inlined codebook — see [[VectorKernels.pqEncode]] for the
  * exact parity contract with the struct/array_min formulation it
  * replaces. The codebook rides into generated code as a reference
  * object (driver-sized index metadata by construction). */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => VectorKernels.FLOAT
    case ArrayType(DoubleType, _) => VectorKernels.DOUBLE
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  // plan strings print the codebook's SHAPE, not its m·ksub·subdim
  // floats — a large index would otherwise serialize into every
  // explain/toString of the plan
  override def stringArgs: Iterator[Any] = Iterator(child,
    s"codebook[m=${codebook.length}, ksub=${codebook.headOption.fold(0)(_.length)}]")

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.map(_.toDouble).toArray).toArray).toArray
  private lazy val childT = elemCode(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.pqEncode(a.asInstanceOf[ArrayData], cb, childT)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("pqRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.catalyst.VectorKernels.pqEncode($a, $cbRef, $childT);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** IVF coarse assignment as ONE fused expression:
  * `nearest_centroid(embedding)` over an inlined centroid set — see
  * [[VectorKernels.nearestCentroid]] for the exact parity contract
  * with the `array_max(array(struct(…)))` tree it replaces. Output:
  * `struct<centroid_id: bigint, sim: double>`. */
case class NearestCentroid(child: Expression, centroids: Seq[(Long, Seq[Float])])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => VectorKernels.FLOAT
    case ArrayType(DoubleType, _) => VectorKernels.DOUBLE
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got ${child.dataType.catalogString}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("centroid_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sim", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"
  // like PqEncode: explain prints the centroid COUNT, not k·dim floats
  override def stringArgs: Iterator[Any] = Iterator(child,
    s"centroids[k=${centroids.length}]")

  // sorted by id HERE, not by caller contract: the kernel's
  // first-seen-wins tie rule equals "lowest id" only over an ascending
  // scan, and the bit-parity claim vs the array_max tree (max sim,
  // then max -id) must hold for ANY construction order
  @transient private lazy val sortedCs: Seq[(Long, Seq[Float])] =
    centroids.sortBy(_._1)
  @transient private lazy val ids: Array[Long] = sortedCs.map(_._1).toArray
  @transient private lazy val ces: Array[Array[Double]] =
    sortedCs.map(_._2.map(_.toDouble).toArray).toArray
  // the same left-fold as the norm()/driver-side cNrm computations
  @transient private lazy val cNrms: Array[Double] =
    ces.map(ce => math.sqrt(ce.foldLeft(0.0)((acc, x) => acc + x * x)))
  private lazy val childT = elemCode(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCentroid(a.asInstanceOf[ArrayData], ids, ces, cNrms, childT)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
    val cesRef = ctx.addReferenceObj("ncCes", ces, "double[][]")
    val nrmRef = ctx.addReferenceObj("ncNrms", cNrms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("ncRes")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.catalyst.VectorKernels.nearestCentroid($a, $idsRef, $cesRef, $nrmRef, $childT);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `array_dot(a, b)` — double-precision dot product. */
case class ArrayDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_dot"
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** `array_l2sq(a, b)` — double-precision squared L2 distance. */
case class ArrayL2Sq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_l2sq"
  override protected def kernel: String = "l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayL2Sq =
    copy(left = l, right = r)
}
