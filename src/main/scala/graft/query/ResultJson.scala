package graft.query

import org.apache.spark.sql.DataFrame

/** Renders a [[PromQl.eval]] result frame as the Prometheus HTTP API's
  * `data` payload (`{"resultType":"vector"|"matrix","result":[...]}`) —
  * the shape dashboards and API clients consume, so the CLI/app layer
  * never reshapes the long frame by hand. An instant query renders as a
  * `vector` (one `value` per series), a range query as a `matrix`
  * (`values` arrays). Values are strings in the API convention, with
  * Go-style shortest formatting (`100`, not `100.0`) and `NaN`/`+Inf`/
  * `-Inf` spelled out; timestamps are epoch seconds with millisecond
  * decimals only when needed.
  *
  * The render iterates the frame on the driver — result frames are
  * lattice-sized (series × instants of the requested window), the same
  * driver-bounded scale every API server returns as one response body.
  */
object ResultJson {

  private[graft] def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Go `strconv.FormatFloat(v, 'f', -1, 64)` value text: shortest
    * round-trip decimal digits, always FIXED notation — no scientific
    * form (`0.0000001`, not `1.0E-7`; `1e21` spelled out). Java's
    * `Double.toString` supplies the shortest digits; `BigDecimal`
    * re-renders them plain. */
  private[query] def fmtV(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "+Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v == 0.0) (if (1 / v < 0) "-0" else "0")
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else new java.math.BigDecimal(java.lang.Double.toString(v))
      .stripTrailingZeros.toPlainString

  private[query] def fmtT(ms: Long): String =
    if (ms % 1000 == 0) (ms / 1000).toString else (ms / 1000.0).toString

  /** One label map as the API's sorted `{"k":"v",…}` object. */
  private[graft] def labelsJson(labels: scala.collection.Map[String, String]): String =
    labels.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")

  /** Render `frame` (`series_key, labels, t, v`) as the API payload.
    * `instant = true` emits the `vector` shape from each series' single
    * (latest) point; otherwise the full `matrix`. */
  def render(frame: DataFrame, instant: Boolean): String = {
    val it = frame.select("series_key", "labels", "t", "v")
      .orderBy("series_key", "t").toLocalIterator()
    val keys = Vector.newBuilder[String]
    val labelsOf = scala.collection.mutable.HashMap.empty[String, String]
    val pointsOf = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Double)]]
    while (it.hasNext) {
      val r = it.next()
      val key = r.getString(0)
      if (!labelsOf.contains(key)) {
        keys += key
        labelsOf(key) = labelsJson(r.getMap[String, String](1))
        pointsOf(key) = scala.collection.mutable.ArrayBuffer.empty
      }
      pointsOf(key) += ((r.getLong(2), r.getDouble(3)))
    }
    val items = keys.result().map { key =>
      val metric = labelsOf(key)
      val pts = pointsOf(key)
      if (instant) {
        val (t, v) = pts.last
        s"""{"metric":$metric,"value":[${fmtT(t)},"${fmtV(v)}"]}"""
      } else {
        val vs = pts.map { case (t, v) => s"""[${fmtT(t)},"${fmtV(v)}"]""" }
          .mkString(",")
        s"""{"metric":$metric,"values":[$vs]}"""
      }
    }
    val rt = if (instant) "vector" else "matrix"
    s"""{"resultType":"$rt","result":[${items.mkString(",")}]}"""
  }
}
