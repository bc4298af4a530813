package graft.query

import scala.io.Source

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Loader-side native-histogram value — the shape of PromQl's `h`
  * channel ([[graft.query.NativeHistogram]] model, FloatHistogram
  * double counts). Top-level so the Spark product encoder applies. */
case class ConfHB(i: Int, c: Double)
case class ConfHV(
    schema: Int, zt: Double, z_count: Double, count: Double, sum: Double,
    neg: Seq[ConfHB], pos: Seq[ConfHB])

/** Replays the upstream-format PromQL conformance corpus
  * (`src/test/resources/promql_conformance.test`, the prometheus
  * promql/promqltest `load`/`eval` block format) against [[PromQl.eval]]
  * on an in-memory frame. Each `eval` block becomes one ScalaTest test;
  * `eval_fail` blocks assert the clean `promql:` rejection. The corpus
  * header documents the divergences from upstream (deterministic
  * limitk/limit_ratio, order-free sort family, no native histograms).
  *
  * Corpus notation: `load <step>` with series lines
  * `metric{labels} v1 v2 ...` where a value token is a number,
  * `start+incrxcount` (count additional points), `valxcount` (repeats),
  * or `_` (gap); `eval instant at <t> <expr>` /
  * `eval range from <a> to <b> step <s> <expr>` followed by expected
  * series lines (values in the same notation, aligned to the lattice);
  * zero expected lines = expect an empty result; `clear` drops the
  * loaded corpus. */
class PromQlConformanceSpec extends SparkSuite {
  import spark.implicits._

  // ---------------------------------------------------------- parsing

  /** `vals`: lattice-aligned expectations (index k → from + k·step).
    * `ats`: timestamped `v@t` expectations (upstream promqltest's
    * instant-matrix notation, t in seconds) — used when an instant
    * query of a top-level range vector returns the raw window. */
  private case class Expected(
      labels: Map[String, String],
      vals: Seq[Option[Double]],
      ats: Seq[(Long, Double)] = Nil)
  private case class EvalBlock(
      line: Int,
      expr: String,
      fail: Boolean,
      fromMs: Long,
      toMs: Long,
      stepMs: Long,
      expected: Seq[Expected],
      samples: Seq[(Map[String, String], Long, Option[Double], Option[ConfHV])])

  private def durMs(s: String): Long =
    if (s.matches("-?[0-9]+")) s.toLong * 1000L
    else {
      val rx = "([0-9]+)(ms|s|m|h|d|w|y)".r
      val parsed = rx.findAllMatchIn(s).map { m =>
        val n = m.group(1).toLong
        m.group(2) match {
          case "ms" => n
          case "s" => n * 1000L
          case "m" => n * 60000L
          case "h" => n * 3600000L
          case "d" => n * 86400000L
          case "w" => n * 7 * 86400000L
          case "y" => n * 365 * 86400000L
        }
      }.sum
      require(parsed > 0 || s.startsWith("0"), s"bad duration '$s'")
      parsed
    }

  private def num(s: String): Double = s match {
    case "Inf" | "+Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case "NaN" => Double.NaN
    case x => x.toDouble
  }

  private val seriesTok =
    """^(-?(?:[0-9]+(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?|\.[0-9]+|Inf)|NaN|\+Inf)(?:([+-](?:[0-9]+(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?|Inf))?x([0-9]+))?$""".r

  private def expand(tokens: Seq[String]): Seq[Option[Double]] =
    tokens.flatMap {
      case "_" => Seq(None)
      case t @ seriesTok(start, incr, count) =>
        if (count == null) Seq(Some(num(start)))
        else {
          val s0 = num(start)
          val inc = if (incr == null) 0.0 else num(incr)
          (0 to count.toInt).map(i => Some(s0 + i * inc))
        }
      case other => sys.error(s"bad series value token '$other'")
    }

  // ------------------------------------------- native-histogram literals

  /** Upstream promqltest histogram literal `{{k:v …}}`, optionally
    * repeated `xN` (N additional points, like `valxN`). Supported
    * fields: schema, sum, count, z_bucket (zero-bucket count),
    * z_bucket_w (zero threshold), buckets/offset (positive),
    * n_buckets/n_offset (negative). Bucket list entry j carries index
    * `offset + j`; index i covers `(base^(i−1), base^i]`. */
  private val histTok = """^\{\{(.*)\}\}(?:x([0-9]+))?$""".r

  private def parseHist(body: String): ConfHV = {
    var schema = 0; var zt = 0.0; var z = 0.0; var cnt = 0.0; var sum = 0.0
    var posL: Seq[Double] = Nil; var negL: Seq[Double] = Nil
    var posOff = 0; var negOff = 0
    val kv = """([a-z_]+):(\[[^\]]*\]|[^\s\]]+)""".r
    kv.findAllMatchIn(body).foreach { m =>
      val v = m.group(2)
      def nums = v.stripPrefix("[").stripSuffix("]").trim
        .split("\\s+").filter(_.nonEmpty).map(_.toDouble).toSeq
      m.group(1) match {
        case "schema" => schema = v.toInt
        case "z_bucket_w" => zt = v.toDouble
        case "z_bucket" => z = v.toDouble
        case "count" => cnt = v.toDouble
        case "sum" => sum = v.toDouble
        case "buckets" => posL = nums
        case "offset" => posOff = v.toInt
        case "n_buckets" => negL = nums
        case "n_offset" => negOff = v.toInt
        case other => sys.error(s"unsupported histogram field '$other'")
      }
    }
    ConfHV(schema, zt, z, cnt, sum,
      negL.zipWithIndex.collect { case (c, j) if c != 0 => ConfHB(negOff + j, c) },
      posL.zipWithIndex.collect { case (c, j) if c != 0 => ConfHB(posOff + j, c) })
  }

  /** Load-block value expansion over BOTH channels: float tokens fill
    * `v`, histogram literals fill `h`. */
  private def expandVals(
      tokens: Seq[String]): Seq[(Option[Double], Option[ConfHV])] =
    tokens.flatMap {
      case histTok(body, reps) =>
        val h = parseHist(body)
        (0 to (if (reps == null) 0 else reps.toInt)).map(_ => (None, Some(h)))
      case t => expand(Seq(t)).map(v => (v, None))
    }

  private def parseLabels(s: String): Map[String, String] = {
    val i = s.indexOf('{')
    if (i < 0) Map("__name__" -> s.trim)
    else {
      val name = s.take(i).trim
      val inner = s.substring(i + 1, s.lastIndexOf('}')).trim
      val m =
        if (inner.isEmpty) Map.empty[String, String]
        else inner.split(",").map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
        }.toMap
      if (name.isEmpty) m else m + ("__name__" -> name)
    }
  }

  /** The engine's canonical key ([[graft.functions.seriesKey]]
    * semantics: name-sorted, empty values dropped). */
  private def keyOf(labels: Map[String, String]): String =
    labels.toSeq.filter(_._2.nonEmpty).sortBy(_._1)
      .map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")

  private def splitSeriesLine(line: String): (String, Seq[String]) = {
    val t = line.trim
    val ws = t.indexWhere(_.isWhitespace) match { case -1 => t.length; case i => i }
    // the id's label braces only count when they start before the first
    // whitespace — a BARE metric name followed by a histogram literal
    // (`hc {{…}}`) must not swallow the literal's braces into the id
    val end =
      if (t.contains('{') && t.indexOf('{') < ws) t.indexOf('}') + 1
      else ws
    val (id, rest) = t.splitAt(end)
    // histogram literals `{{…}}` contain spaces — keep each one (plus
    // any `xN` suffix) a single token
    val toks = Seq.newBuilder[String]
    var s = rest.trim
    while (s.nonEmpty) {
      val tok =
        if (s.startsWith("{{")) {
          val e = s.indexOf("}}") + 2
          require(e >= 2, s"unterminated histogram literal in '$line'")
          s.take(e) + s.drop(e).takeWhile(!_.isWhitespace)
        } else s.takeWhile(!_.isWhitespace)
      toks += tok
      s = s.drop(tok.length).trim
    }
    (id, toks.result())
  }

  private val evalInstantRx = """^(eval|eval_fail)\s+instant\s+at\s+(\S+)\s+(.*)$""".r
  private val evalRangeRx =
    """^(eval|eval_fail)\s+range\s+from\s+(\S+)\s+to\s+(\S+)\s+step\s+(\S+)\s+(.*)$""".r

  private def parseCorpus(text: String): Seq[EvalBlock] = {
    val lines = text.linesIterator.toVector
    val blocks = Vector.newBuilder[EvalBlock]
    var loaded =
      Vector.empty[(Map[String, String], Long, Option[Double], Option[ConfHV])]
    var i = 0
    def contentLines(): Seq[(Int, String)] = {
      val out = Seq.newBuilder[(Int, String)]
      while (i < lines.length && lines(i).startsWith(" ") && lines(i).trim.nonEmpty) {
        out += ((i + 1, lines(i)))
        i += 1
      }
      out.result()
    }
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) i += 1
      else if (line == "clear") { loaded = Vector.empty; i += 1 }
      else if (line.startsWith("load ")) {
        val step = durMs(line.stripPrefix("load ").trim)
        i += 1
        contentLines().foreach { case (_, raw) =>
          val (id, toks) = splitSeriesLine(raw)
          val labels = parseLabels(id)
          loaded ++= expandVals(toks).zipWithIndex.collect {
            case ((v, h), k) if v.isDefined || h.isDefined =>
              (labels, k * step, v, h)
          }
        }
      } else {
        val (fail, fromMs, toMs, stepMs, expr) = line match {
          case evalInstantRx(kind, at, e) =>
            val t = durMs(at)
            (kind == "eval_fail", t, t, 60000L, e.trim)
          case evalRangeRx(kind, a, b, s, e) =>
            (kind == "eval_fail", durMs(a), durMs(b), durMs(s), e.trim)
          case other => sys.error(s"line ${i + 1}: unrecognized '$other'")
        }
        val headerLine = i + 1
        i += 1
        val expected = contentLines().map { case (_, raw) =>
          val (id, toks) = splitSeriesLine(raw)
          if (toks.exists(_.contains('@'))) {
            val ats = toks.map { t =>
              val Array(v, ts) = t.split("@", 2)
              (math.round(ts.toDouble * 1000), num(v))
            }
            Expected(parseLabels(id), Nil, ats)
          } else Expected(parseLabels(id), expand(toks))
        }
        blocks += EvalBlock(headerLine, expr, fail, fromMs, toMs, stepMs,
          expected, loaded)
      }
    }
    blocks.result()
  }

  // ---------------------------------------------------------- running

  private def frameOf(
      samples: Seq[(Map[String, String], Long, Option[Double], Option[ConfHV])])
      : DataFrame =
    samples.toDF("labels", "t", "v", "h")
      .withColumn("series_key",
        graft.functions.seriesKey(org.apache.spark.sql.functions.col("labels")))
      .select("series_key", "labels", "t", "v", "h")

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))

  private val corpus: Seq[EvalBlock] = {
    val in = getClass.getResourceAsStream("/promql_conformance.test")
    require(in != null, "promql_conformance.test missing from test resources")
    val text = Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    parseCorpus(text)
  }

  private def runEval(b: EvalBlock, p: PromQl.Params): Unit = {
    val got = PromQl.eval(b.expr, frameOf(b.samples), p)
      .select("series_key", "t", "v").as[(String, Long, Double)]
      .collect().map { case (k, t, v) => (k, t) -> v }.toMap
    val want = b.expected.flatMap { e =>
      val key = keyOf(e.labels)
      e.vals.zipWithIndex.collect {
        case (Some(v), k) => (key, b.fromMs + k * b.stepMs) -> v
      } ++ e.ats.map { case (t, v) => (key, t) -> v }
    }.toMap
    val missing = want.keySet -- got.keySet
    val extra = got.keySet -- want.keySet
    assert(missing.isEmpty && extra.isEmpty,
      s"result keys differ: missing=${missing.take(4)} extra=${extra.take(4)}")
    val bad = want.collect {
      case (k, w) if !close(got(k), w) => (k, w, got(k))
    }
    assert(bad.isEmpty, s"values differ (want vs got): ${bad.take(4)}")
  }

  corpus.foreach { b =>
    val kind = if (b.fail) "eval_fail" else "eval"
    test(s"L${b.line} $kind: ${b.expr}") {
      val df = frameOf(b.samples)
      val p = PromQl.Params(b.fromMs, b.toMs, b.stepMs)
      if (b.fail) {
        // compile-time rejections throw at eval(); execution errors
        // (duplicate match keys — raise_error in the plan) surface at
        // the action, possibly wrapped in Spark's task-failure chain
        val ex = intercept[Throwable] { PromQl.eval(b.expr, df, p).collect() }
        val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
          .map(e => String.valueOf(e.getMessage)).mkString("\n")
        assert(msgs.contains("promql:"),
          s"expected a promql: rejection, got: $msgs")
      } else runEval(b, p)
    }
  }

  // Differential pass: every range-vector block re-evaluates with the
  // RANGE-frame window plan FORCED (rangeExplodeCapK = 0) and must
  // land on the same corpus expectation as the candidate explode —
  // the two plans are pinned equal wherever the corpus reaches a
  // range aggregate.
  corpus.filter(b => !b.fail && b.expr.contains("[")).foreach { b =>
    test(s"L${b.line} window-plan: ${b.expr}") {
      runEval(b, PromQl.Params(b.fromMs, b.toMs, b.stepMs,
        rangeExplodeCapK = 0))
    }
  }

  test("conformance corpus covers at least 100 upstream-format vectors") {
    assert(corpus.size >= 100, s"only ${corpus.size} eval blocks")
  }
}
