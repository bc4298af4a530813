package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}

import graft.model.XXHash64

/** Static kernel for [[LabelsHash]] — a plain object (compiles to Java
  * static methods) so generated code can call it without reflection.
  */
object LabelsHashImpl {
  /** xxhash64(seed 0) over the reference's canonical label encoding
    * `name \xff value \xff ...` with entries sorted by name and
    * empty/null values dropped (reference `labels/labels.go:61-71`;
    * empty-strip `labels/labels.go:106-121`). Byte-identical to
    * [[graft.model.Labels.hash]].
    */
  def hashLabels(map: MapData): Long = {
    val n = map.numElements()
    val keys = map.keyArray()
    val vals = map.valueArray()

    // indices of entries with non-empty values, sorted by key bytes
    // (UTF8String.compareTo is binary, same order as Go's string sort)
    var m = 0
    val idx = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (!vals.isNullAt(i) && vals.getUTF8String(i).numBytes() > 0) {
        idx(m) = i; m += 1
      }
      i += 1
    }
    // insertion sort by key — label sets are tiny (<=20 entries)
    var a = 1
    while (a < m) {
      val cur = idx(a)
      val curKey = keys.getUTF8String(cur)
      var b = a - 1
      while (b >= 0 && keys.getUTF8String(idx(b)).compareTo(curKey) > 0) {
        idx(b + 1) = idx(b); b -= 1
      }
      idx(b + 1) = cur
      a += 1
    }

    var size = 0
    i = 0
    while (i < m) {
      size += keys.getUTF8String(idx(i)).numBytes() +
        vals.getUTF8String(idx(i)).numBytes() + 2
      i += 1
    }
    val buf = new Array[Byte](size)
    var off = 0
    i = 0
    while (i < m) {
      off = put(buf, off, keys.getUTF8String(idx(i)).getBytes)
      off = put(buf, off, vals.getUTF8String(idx(i)).getBytes)
      i += 1
    }
    XXHash64.hash(buf, 0L)
  }

  private def put(buf: Array[Byte], off: Int, bytes: Array[Byte]): Int = {
    System.arraycopy(bytes, 0, buf, off, bytes.length)
    buf(off + bytes.length) = 0xff.toByte
    off + bytes.length + 1
  }
}

/** Catalyst expression: 64-bit series identity hash of a
  * `map<string,string>` labels column, with exact byte parity to the
  * reference's `Labels.Hash()` (`labels/labels.go:61-71`).
  *
  * A native `Expression` (not a UDF) so it stays inside whole-stage
  * codegen: `doGenCode` emits a direct static call, no serialization,
  * no row boxing. Registered as SQL function `labels_hash` by
  * [[GraftExtensions]].
  */
case class LabelsHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"labels_hash requires map<string,string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "labels_hash"

  override protected def nullSafeEval(input: Any): Any =
    LabelsHashImpl.hashLabels(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.LabelsHashImpl.hashLabels($c)")

  override protected def withNewChildInternal(newChild: Expression): LabelsHash =
    copy(child = newChild)
}
