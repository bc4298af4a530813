package graft.catalyst

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.labelsHash
import graft.matchers.Matcher
import graft.model.Labels

class CatalystSpec extends SparkSuite {
  import spark.implicits._

  private lazy val installed = { GraftExtensions.install(spark); true }

  test("ArrayDot/ArrayL2Sq: bit-parity with the zip_with fold, null poisoning, length mismatch") {
    assert(installed)
    import graft.llm.Similarity
    val df = Seq(
      (1L, Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.75f)),
      (2L, Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))).toDF("id", "a", "b")
    // the interpreted fold this expression replaced — must agree BITWISE
    def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      Similarity.dot($"a", $"b").as("d"), foldDot($"a", $"b").as("df_"),
      Similarity.l2Sq($"a", $"b").as("l"),
      aggregate(zip_with($"a", $"b", (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("lf_")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    // SQL registration (array_dot / array_l2sq) resolves via install()
    val viaSql = df.selectExpr("array_dot(a, b) AS d").collect().map(_.getDouble(0))
    assert(java.lang.Double.doubleToLongBits(viaSql(0)) ==
      java.lang.Double.doubleToLongBits(rows(0).getDouble(0)))
    // length mismatch and null elements both poison to NULL (zip_with pads)
    val edge = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),
      (Seq(1f, 2f), Seq.empty[Float])).toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("d")).collect()
    assert(edge.forall(_.isNullAt(0)))
    val withNull = spark.sql(
      "SELECT array_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))) AS d").collect()
    assert(withNull.head.isNullAt(0))
    // empty × empty = 0.0, the fold's seed
    val empty = spark.sql(
      "SELECT array_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS d")
      .collect()
    assert(empty.head.getDouble(0) == 0.0)
  }

  test("PqEncode/NearestCentroid: bit-parity with the struct/array_min|max trees they fused") {
    assert(installed)
    import graft.llm.Similarity
    // deterministic pseudo-random corpus with planted TIE rows (vector
    // equidistant to two codebook entries / two centroids — the
    // lowest-code/lowest-id rule must decide)
    val dim = 8
    val vecs = (0 until 64).map { i =>
      (i.toLong, (0 until dim).map(d => (math.sin(i * 31 + d * 7) * 3).toFloat))
    } :+ (900L, Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)) // ties sub 0 vs sub 1 shapes
    val df = vecs.toDF("vec_id", "embedding")

    val cb: Seq[Seq[Seq[Float]]] = Seq(
      Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(1f, 0f, 0f, 0f)), // dup entry -> tie
      Seq(Seq(0f, 0f, 0f, 1f), Seq(1f, 0f, 0f, 0f)))
    // the pre-fusion formulation, reconstructed verbatim
    val subdim = 4
    def oldCodes = {
      val sliced = (0 until 2).foldLeft(df)((d, s) =>
        d.withColumn(s"__sub_$s", slice($"embedding", s * subdim + 1, subdim)))
      sliced.select($"vec_id", array((0 until 2).map { s =>
        array_min(array(cb(s).zipWithIndex.map { case (ce, code) =>
          struct(
            round(Similarity.l2Sq(col(s"__sub_$s"), typedLit(ce)), 4).as("d"),
            lit(code).as("code"))
        }: _*)).getField("code")
      }: _*).as("codes"))
    }
    val got = Similarity.pqEncode(df, cb).select("vec_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    val want = oldCodes.as[(Long, Seq[Int])].collect().toMap
    assert(got == want)
    assert(got(900L) == Seq(0, 1)) // tie in sub 0 resolves to the LOWEST code

    val cs: Seq[(Long, Seq[Float])] = Seq(
      (3L, (0 until dim).map(d => math.cos(d * 13).toFloat)),
      (5L, (0 until dim).map(d => math.sin(d * 17).toFloat)),
      (9L, (0 until dim).map(d => math.cos(d * 13).toFloat))) // dup of 3 -> tie
    def oldAssign = {
      val cands = cs.map { case (cid, ce) =>
        val cNrm = math.sqrt(ce.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
        struct(
          round(Similarity.dot($"embedding", typedLit(ce)) / ($"__v_nrm" * lit(cNrm)), 4).as("sim"),
          lit(-cid).as("neg_id"), lit(cid).as("centroid_id"))
      }
      df.withColumn("__v_nrm", Similarity.norm($"embedding"))
        .withColumn("__best", array_max(array(cands: _*)))
        .select($"vec_id", $"__best.centroid_id", $"__best.sim")
    }
    val gotA = Similarity.ivfAssign(df, cs.toDF("vec_id", "embedding"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val wantA = oldAssign.as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotA == wantA)
    // every duplicate-centroid tie resolved to id 3, never 9
    assert(gotA.values.forall(_._1 != 9L))
  }

  test("fused expressions: null elements and short vectors poison the row to NULL") {
    assert(installed)
    import graft.llm.Similarity
    val cb: Seq[Seq[Seq[Float]]] = Seq(Seq(Seq(1f, 0f), Seq(0f, 1f)))
    val cs: Seq[(Long, Seq[Float])] = Seq((0L, Seq(1f, 0f, 0f, 0f)))
    // a null element and a too-short vector — both poison
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT))),
        |  (2L, array(CAST(1 AS FLOAT))),
        |  (3L, array(CAST(1 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT)))
        |AS t(vec_id, embedding)""".stripMargin)
    val enc = Similarity.pqEncode(df, cb).select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(enc(1L) && enc(2L) && !enc(3L))
    val asg = Similarity.ivfAssign(df, cs.toDF("vec_id", "embedding"))
    // assignment output drops nothing but carries null verdicts
    val rows = asg.collect().map(r => r.getAs[Long]("vec_id") ->
      r.isNullAt(asg.columns.indexOf("centroid_id"))).toMap
    assert(rows(1L) && rows(2L) && !rows(3L))
  }

  test("LabelsHash matches the pure-model hash byte for byte") {
    assert(installed)
    val rows = Seq(
      Map("b" -> "2", "a" -> "1"),            // unsorted input map
      Map("a" -> "1", "b" -> "2"),            // same set, different order
      Map("a" -> "1", "b" -> "2", "c" -> ""), // empty value dropped
      Map("__name__" -> "up", "job" -> "api", "instance" -> "host:9090"),
      Map.empty[String, String])
    val got = rows.toDF("labels")
      .select(labelsHash($"labels").as("h"))
      .collect().map(_.getLong(0))
    val want = rows.map(m => Labels.fromMap(m).hash)
    assert(got.toSeq == want)
    assert(got(0) == got(1) && got(1) == got(2)) // order/empty invariance
  }

  test("LabelsHash survives codegen and interpreted paths identically") {
    assert(installed)
    val df = Seq(Map("x" -> "y", "k" -> "v")).toDF("labels")
    val viaSql = {
      df.createOrReplaceTempView("lh_t")
      spark.sql("SELECT labels_hash(labels) AS h FROM lh_t").head().getLong(0)
    }
    assert(viaSql == Labels(("x", "y"), ("k", "v")).hash)
    // null labels -> null hash
    val n = Seq((1, null.asInstanceOf[Map[String, String]])).toDF("i", "labels")
      .select(labelsHash($"labels")).head()
    assert(n.isNullAt(0))
  }

  // non-local source: a LocalRelation would be constant-folded before
  // the rewrite could be observed in the optimized plan
  private def rangeStrings = spark.range(10)
    .select(element_at(array(lit("a"), lit("b"), lit("x"), lit("ab"), lit("xax"), lit("a.c")),
      ($"id" % 6 + 1).cast("int")).as("s"))

  test("RegexSetRewrite turns anchored alternations into IN lists") {
    assert(installed)
    val q = rangeStrings.where($"s".rlike("^(?:a|b)$"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains(" IN "), s"expected IN in:\n$optimized")
    assert(!optimized.toLowerCase.contains("rlike"), s"expected no RLIKE in:\n$optimized")
    assert(q.as[String].collect().sorted.toSeq == Seq("a", "a", "b", "b"))
  }

  test("RegexSetRewrite leaves unanchored and non-literal patterns alone") {
    assert(installed)
    // unanchored: substring semantics must be preserved ("a" also hits
    // "ab", "xax", "a.c" via find-style matching)
    val un = rangeStrings.where($"s".rlike("a|b"))
    assert(un.queryExecution.optimizedPlan.toString.toLowerCase.contains("rlike"))
    assert(un.count() == 8) // everything but the two "x" rows
    // metacharacters: not a literal set
    val meta = rangeStrings.where($"s".rlike("^(?:a.c)$"))
    assert(meta.queryExecution.optimizedPlan.toString.toLowerCase.contains("rlike"))
    assert(meta.as[String].collect().toSet == Set("a.c")) // '.' kept as regex
  }

  test("anchoredSetMatches accepts only anchored literal alternations") {
    assert(Matcher.anchoredSetMatches("^(?:a|b|c)$").contains(Seq("a", "b", "c")))
    assert(Matcher.anchoredSetMatches("^(a|b)$").contains(Seq("a", "b")))
    assert(Matcher.anchoredSetMatches("a|b").isEmpty)
    assert(Matcher.anchoredSetMatches("^(?:a.*)$").isEmpty)
    assert(Matcher.anchoredSetMatches("^(?:)$").isEmpty)
  }
}
