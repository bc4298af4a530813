package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("shingles: 3-grams, distinct, short-text safe") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y z x y z x y")).toDF("doc_id", "text")
    val got = df.select($"doc_id", Dedup.shingles($"text")).as[(Long, Seq[String])]
      .collect().toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq.empty) // shorter than n
    assert(got(3L).toSet == Set("x y z", "y z x", "z x y")) // distinct
  }

  test("exact dedup groups duplicates under min doc_id") {
    val df = Seq((5L, "same text"), (2L, "same text"), (9L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(df).select("survivor", "group_size")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 2L), (9L, 1L)))
  }

  test("ngram jaccard finds the planted near-dup and nothing else") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words with zero overlap here now")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, threshold = 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("stop-shingle df cap bounds a viral shingle and keeps Jaccard exact on the rest") {
    // every doc shares one viral boilerplate 3-gram; pairs 1-2 and 3-4
    // are true near-dups beyond it
    val viral = "copyright acme corp"
    val docs = Seq(
      (1L, s"$viral alpha beta gamma delta epsilon zeta"),
      (2L, s"$viral alpha beta gamma delta epsilon eta"),
      (3L, s"$viral one two three four five six"),
      (4L, s"$viral one two three four five seven"),
      (5L, s"$viral unrelated totally different words here now")
    ).toDF("doc_id", "text")
    // cap 4 < df 5: the viral shingle (and its overlapping neighbors at
    // df 5) leave the universe; the planted pairs still clear 0.4, and
    // doc 5 no longer pairs with anyone through boilerplate alone
    val capped = Dedup.ngramJaccardPairs(docs, threshold = 0.4, maxShingleDf = Some(4))
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L), (3L, 4L)))
    // sanity: the capped universe drops the df-5 shingles only
    val uni = Dedup.shingleIndex(docs, maxDf = Some(4))
      .groupBy("sh_h").count().where($"count" > 4).count()
    assert(uni == 0)
  }

  test("dupShingleFraction: shared shingles counted corpus-wide, unique docs at zero") {
    val df = Seq(
      // docs 1 and 2 share exactly their first 3-gram ("a b c"); the
      // rest of each is unique
      (1L, "a b c one two three"),   // shingles: "a b c","b c one","c one two","one two three"
      (2L, "a b c four five six"),
      (3L, "seven eight nine ten")). // fully unique
      toDF("doc_id", "text")
    val got = Dedup.dupShingleFraction(df)
      .select("doc_id", "n_sh", "n_dup", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 1L, 0.25)))
    assert(got(2L) == ((2L, 4L, 1L, 0.25)))
    assert(got(3L) == ((3L, 2L, 0L, 0.0)))
  }

  test("cross-corpus decontamination flags planted leakage only") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different content with no overlap at all here"),
      (3L, "the quick brown fox jumps over something else entirely")
    ).toDF("doc_id", "text")
    val test = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again now"),
      (101L, "unrelated evaluation prompt nothing shared with training")
    ).toDF("doc_id", "text")
    val got = Dedup.crossCorpusOverlap(train, test, minShared = 5)
      .select("train_id", "test_id").as[(Long, Long)].collect().toSet
    // doc 1 leaks into test 100 (8 shared 3-grams); doc 3 shares only 4
    // ("the quick brown" .. "fox jumps over") and stays under the bar
    assert(got == Set((1L, 100L)))
    // threshold is inclusive and counts distinct shingles
    val all = Dedup.crossCorpusOverlap(train, test, minShared = 1)
      .where($"train_id" === 3 && $"test_id" === 100)
      .select("n_shared").as[Long].collect()
    assert(all.toSeq == Seq(4L))
  }

  test("minhash LSH candidates are a superset-recall of high-jaccard pairs here") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.ngramJaccardPairs(docs).select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs).select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // verification step guarantees precision 1
    assert(lsh.nonEmpty || exact.isEmpty)
  }

  test("jaccard self-join reuses one exchange; minhash plan is lambda-free") {
    val docs = Tables.documents(spark, sf)
    // the two branches of the inverted-index self-join must dedupe into
    // one ReusedExchange — at corpus scale the index build is the
    // dominant cost and must not run twice
    val jac = Dedup.ngramJaccardPairs(docs)
    jac.collect() // AQE only materializes exchange reuse in the final plan
    assert(jac.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      jac.queryExecution.executedPlan.toString.take(2000))
    // the minhash pipeline stays inside whole-stage codegen: no
    // higher-order-function lambdas (they evaluate interpreted)
    val mh = Dedup.minhashLshPairs(docs)
    val plan = mh.queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan.take(2000))
  }

  test("minhash LSH: packed band keys + hashed verify sets ≡ the string formulation") {
    // r13 pin: the candidate exchange carries PACKED 56-bit band keys
    // (two mins per long) and the verification arrays carry
    // xxhash64(shingle) longs. Both are representation changes only —
    // this re-derives the pre-r13 string formulation (concat_ws band
    // keys, string shingle sets) inline and requires the IDENTICAL
    // (i, j, jaccard) set on the real document corpus.
    val docs = Tables.documents(spark, sf)
    val got = Dedup.minhashLshPairs(docs)
      .select("i", "j", "jaccard").as[(Long, Long, Double)].collect().toSet
    val perms = Dedup.permutations()
    val shdf = docs.select($"doc_id", Dedup.shingles($"text").as("shs"))
      .where(size($"shs") > 0)
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * $"h" + lit(b)) % Dedup.MINHASH_MOD).as(s"m$i") }
    val sig = shdf.select($"doc_id", explode($"shs").as("s"))
      .withColumn("h", TextStats.wordHash($"s"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
    val banded = sig.select($"doc_id", posexplode(array((0 until 4).map(bi =>
        concat_ws("-", (0 until 4).map(ri => col(s"m${bi * 4 + ri}")): _*)): _*))
      .as(Seq("band", "key")))
    val cands = banded.join(
        banded.select($"band", $"key", $"doc_id".as("j")), Seq("band", "key"))
      .where($"doc_id" < $"j")
      .select($"doc_id".as("i"), $"j").distinct()
    val want = cands
      .join(shdf.select($"doc_id".as("i"), $"shs".as("si")), "i")
      .join(shdf.select($"doc_id".as("j"), $"shs".as("sj")), "j")
      .withColumn("inter", size(array_intersect($"si", $"sj")))
      .withColumn("jaccard", round(
        $"inter".cast("double") / (size($"si") + size($"sj") - $"inter"), 4))
      .where($"jaccard" >= 0.4)
      .select("i", "j", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("simhash of near-identical docs is close in hamming distance") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val m = Dedup.simhash(df).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }

  test("connected components: chains collapse, components stay separate") {
    // 1-2-3-4 is a path (transitivity: no direct 1~4 edge), {10,11}
    // a pair, 99 isolated (edge to itself must be ignored)
    val edges = Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L), (99L, 99L))
      .toDF("i", "j")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: a long chain needs the log-round closure") {
    // a 64-node path: one-hop label propagation would need 63 rounds;
    // alternating star must converge within the default maxIter (25)
    val edges = (1L until 64L).map(k => (k, k + 1)).toDF("u", "v")
    val got = Dedup.connectedComponents(edges).as[(Long, Long)].collect()
    assert(got.length == 64 && got.forall(_._2 == 1L))
  }

  test("dedup survivors keep one doc per cluster and all singletons") {
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "e")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    val got = Dedup.dedupSurvivors(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L, 7L)) // 2,3 fold into 1's cluster
  }
}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf)

  test("cosineTopK: self-similarity excluded, scores in [-1,1], k respected") {
    val got = Similarity.cosineTopK(emb, emb.where($"vec_id" < 3), k = 4).collect()
    assert(got.length == 12)
    assert(got.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("neighbor_id")))
    assert(got.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0001))
  }

  test("identical vector ranks first with sim 1") {
    val dup = emb.where($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val got = Similarity.cosineTopK(emb.unionByName(dup), emb.where($"vec_id" === 0), k = 1)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") == 9999L && got.getAs[Double]("sim") == 1.0)
  }

  test("ivfTopK probes nearest lists and returns k ranked neighbors") {
    val centroids = emb.where($"vec_id" < 8)
    val got = Similarity.ivfTopK(emb, centroids, emb.where($"vec_id" < 3), k = 3, nprobe = 3)
    val rows = got.collect()
    assert(rows.length <= 9 && rows.nonEmpty)
    // approximate ⊆ exhaustive scores: every IVF hit's sim must equal the
    // brute-force sim for that (q, neighbor)
    val brute = Similarity.cosineTopK(emb, emb.where($"vec_id" < 3), k = 400)
      .select("q_id", "neighbor_id", "sim").as[(Long, Long, Double)]
      .collect().map { case (q, n, s) => (q, n) -> s }.toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      assert(brute(key) == r.getAs[Double]("sim"))
    }
  }

  test("persisted IVF layout: partition-pruned probes, identical answers") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val centroids = emb.where($"vec_id" < 8)
    Similarity.ivfWrite(emb, centroids, root)
    val queries = emb.where($"vec_id" < 3)
    val got = Similarity.ivfTopKPersisted(root, queries, k = 3, nprobe = 2)
    // the corpus scan must read ONLY the probed centroid_id dirs
    // (3 queries x 2 probes -> at most 6 of the 8 lists)
    val phys = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = phys.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("corpus")) => s
    }
    assert(scans.nonEmpty, phys.toString.take(2000))
    scans.foreach { s =>
      // the static isin filter must prune on its own (Spark may add a
      // dynamic-pruning filter from the probes join on top; that one
      // can't be evaluated before execution, so exclude it here)
      val static = s.partitionFilters.filterNot(
        _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined)
      assert(static.nonEmpty, s.toString.take(1500))
      assert(s.relation.location.listFiles(static, Nil).size <= 6,
        "probe scan did not prune the centroid lists")
    }
    // layout must not change the answer vs the ad-hoc path
    val adhoc = Similarity.ivfTopK(emb, centroids, queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val pers = got.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(pers == adhoc)
  }

  test("persisted IVF+PQ layout: code-only pruned scan, identical ADC answers") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val centroids = emb.where($"vec_id" < 8)
    val cb = Similarity.pqTrain(emb, dim = 64, m = 4, ksub = 8,
      iters = 0, init = emb.where($"vec_id" < 8))
    Similarity.ivfPqWrite(emb, centroids, cb, root)
    val queries = emb.where($"vec_id" < 3)
    val got = Similarity.ivfPqTopKPersisted(root, queries, k = 3, nprobe = 2)
    val phys = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = phys.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("codes")) => s
    }
    assert(scans.nonEmpty, phys.toString.take(2000))
    scans.foreach { s =>
      // probed lists only…
      val static = s.partitionFilters.filterNot(
        _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined)
      assert(static.nonEmpty, s.toString.take(1500))
      assert(s.relation.location.listFiles(static, Nil).size <= 6,
        "ADC probe scan did not prune the centroid lists")
      // …and NO float vector on the scan: codes + ids only
      assert(!s.schema.fieldNames.contains("embedding"), s.schema.catalogString)
    }
    // the on-disk shape must not change the answer vs the ad-hoc path
    val adhoc = Similarity.ivfPqTopK(emb, centroids, cb, queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val pers = got.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(pers == adhoc)
  }

  test("cosineNearDupPairs finds planted duplicates, i < j, above threshold") {
    val dup = emb.where($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val got = Similarity.cosineNearDupPairs(emb.unionByName(dup), threshold = 0.99)
      .collect()
    assert(got.exists(r =>
      r.getAs[Long]("i") == 0L && r.getAs[Long]("j") == 9999L &&
        r.getAs[Double]("sim") == 1.0))
    assert(got.forall(r => r.getAs[Long]("i") < r.getAs[Long]("j")))
    assert(got.forall(r => r.getAs[Double]("sim") >= 0.99))
  }

  test("signLshTopK only returns same-bucket neighbors") {
    val got = Similarity.signLshTopK(emb, emb.where($"vec_id" < 5), k = 3)
    val withBuckets = got.join(
      emb.select($"vec_id".as("neighbor_id"), Similarity.signBucket($"embedding").as("nb")),
      "neighbor_id")
      .join(emb.select($"vec_id".as("q_id"), Similarity.signBucket($"embedding").as("qb")), "q_id")
    assert(withBuckets.where($"nb" =!= $"qb").count() == 0)
  }

  test("hyperplane LSH: multi-table recall vs exact top-k meets the configured target") {
    val queries = emb.where($"vec_id" < 5)
    val exact = Similarity.cosineTopK(emb, queries, k = 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.hyperplaneLshTopK(emb, queries, k = 10,
        dim = 64, bits = 3, tables = 8, seed = 42L)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"hyperplane LSH recall@10 (bits=3, tables=8): $recall")
    // deterministic (seeded planes, fixed data); asserted with slack
    // under the ~0.85 expectation for these settings on near-random data
    assert(recall >= 0.5, s"recall $recall")
    // and one more table can only add candidates (recall is monotone)
    val more = Similarity.hyperplaneLshTopK(emb, queries, k = 10,
        dim = 64, bits = 3, tables = 10, seed = 42L)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((exact & more).size >= (exact & approx).size)

    // at the emb_rand_lsh_multi oracle config (bits=6, seed=7): the
    // 2-table union's recall@3 is >= the single table's
    val exact3 = Similarity.cosineTopK(emb, queries, k = 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def at(tables: Int) = Similarity.hyperplaneLshTopK(emb, queries, k = 3,
        dim = 64, bits = 6, tables = tables, seed = 7L)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((exact3 & at(2)).size >= (exact3 & at(1)).size)
  }

  test("pq: training converges to subspace cluster means; duplicates share codes; ADC finds the twin") {
    // dim=4, m=2 subspaces of 2; each subspace has two well-separated
    // clusters around (0,0) and (10,10)
    val corpus = Seq(
      (0L, Seq(0.1f, 0.0f, 10.1f, 10.0f)),   // init seed 0
      (1L, Seq(10.0f, 10.2f, 0.2f, 0.0f)),   // init seed 1
      (2L, Seq(0.0f, 0.2f, 9.9f, 10.1f)),
      (3L, Seq(9.9f, 10.0f, 0.0f, 0.1f)),
      (4L, Seq(0.1f, 0.0f, 10.1f, 10.0f)))   // exact duplicate of 0
      .toDF("vec_id", "embedding")
    val init = corpus.where(col("vec_id") < 2)

    val sampled = Similarity.pqTrain(corpus, dim = 4, m = 2, ksub = 2, iters = 0, init)
    val trained = Similarity.pqTrain(corpus, dim = 4, m = 2, ksub = 2, iters = 3, init)
    assert(trained.size == 2 && trained.forall(_.size == 2))
    // trained entries are the per-cluster means (3 low vectors / 2 high
    // per subspace-cluster), far from the raw seeds
    def err(cb: Seq[Seq[Seq[Float]]]): Double = {
      val codes = Similarity.pqEncode(corpus, cb)
        .select("vec_id", "embedding", "codes")
        .as[(Long, Seq[Float], Seq[Int])].collect()
      codes.map { case (_, emb, cs) =>
        cs.zipWithIndex.map { case (c, s) =>
          val ce = cb(s)(c)
          emb.slice(s * 2, (s + 1) * 2).zip(ce)
            .map { case (x, y) => (x - y).toDouble * (x - y) }.sum
        }.sum
      }.sum
    }
    assert(err(trained) < err(sampled),
      s"training must cut quantization error: ${err(trained)} vs ${err(sampled)}")

    val codes = Similarity.pqEncode(corpus, trained)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == codes(4L)) // exact duplicate -> identical codes
    assert(codes.values.forall(_.forall(c => c >= 0 && c < 2)))

    val top = Similarity.pqAdcTopK(
        Similarity.pqEncode(corpus, trained), trained,
        corpus.where(col("vec_id") === 0), k = 2)
      .select("q_id", "rank", "neighbor_id", "adist")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    // ADC is asymmetric: every neighbor sharing the query's codes sits
    // at the query's own quantization distance — so the same-cluster
    // vectors {2, 4} tie at the top (id tiebreak), ahead of the
    // opposite-cluster ones
    assert(top.map(_._3).toSet == Set(2L, 4L))
    assert(top(0)._4 == top(1)._4)
  }

  test("ivfPqTopK scores only the probed lists, ADC-consistent within them") {
    val corpus = Seq(
      (0L, Seq(0.1f, 0.0f, 10.1f, 10.0f)),
      (1L, Seq(10.0f, 10.2f, 0.2f, 0.0f)),
      (2L, Seq(0.0f, 0.2f, 9.9f, 10.1f)),
      (3L, Seq(9.9f, 10.0f, 0.0f, 0.1f)),
      (4L, Seq(0.1f, 0.0f, 10.1f, 10.0f)))
      .toDF("vec_id", "embedding")
    val centroids = corpus.where(col("vec_id") < 2)
    val cb = Similarity.pqTrain(corpus, dim = 4, m = 2, ksub = 2, iters = 0,
      init = corpus.where(col("vec_id") < 2))
    val assign = Similarity.ivfAssign(corpus, centroids)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val got = Similarity.ivfPqTopK(corpus, centroids, cb,
        corpus.where(col("vec_id") === 0), k = 5, nprobe = 1)
      .select("q_id", "rank", "neighbor_id", "adist")
      .as[(Long, Int, Long, Double)].collect()
    // nprobe=1: every returned neighbor lives in q's own list
    assert(got.nonEmpty)
    assert(got.forall(r => assign(r._3) == assign(0L)), got.mkString(","))
    // and within the probed list the scores match the plain ADC path
    val adc = Similarity.pqAdcTopK(
        Similarity.pqEncode(corpus, cb), cb,
        corpus.where(col("vec_id") === 0), k = 5)
      .select("neighbor_id", "adist").as[(Long, Double)].collect().toMap
    assert(got.forall(r => adc(r._3) == r._4))
    // nprobe = #centroids degenerates to the full ADC ranking
    val full = Similarity.ivfPqTopK(corpus, centroids, cb,
        corpus.where(col("vec_id") === 0), k = 5, nprobe = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSet
    val fullAdc = Similarity.pqAdcTopK(Similarity.pqEncode(corpus, cb), cb,
        corpus.where(col("vec_id") === 0), k = 5)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSet
    assert(full == fullAdc)
  }

  test("int8 quantization: codes bounded, max magnitude hits 127, cosine preserved to quant error") {
    val q = Similarity.quantized(emb)
    val rows = q.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.map(math.abs).max == 127) // the max-|x| dim saturates
    }
    // per-vector scales cancel in cosine: search over codes ≈ search
    // over raw vectors, within quantization error
    val raw = emb.where($"vec_id" < 2).select(
      Similarity.cosine($"embedding", $"embedding").as("c")).as[Double].head()
    assert(math.abs(raw - 1.0) < 1e-9)
    val pair = q.where($"vec_id" < 2)
      .select($"vec_id", $"codes".cast("array<double>").as("e")).collect()
    val rawPair = emb.where($"vec_id" < 2)
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cq = cos(pair(0).getSeq[Double](1), pair(1).getSeq[Double](1))
    val cr = cos(rawPair(0).getSeq[Double](1), rawPair(1).getSeq[Double](1))
    assert(math.abs(cq - cr) < 0.01, s"quantized $cq vs raw $cr")
  }

  test("kmeansFit: spherical objective improves over raw-vector init and feeds ivfTopK") {
    def objective(centroids: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, centroids).agg(avg("sim")).head().getDouble(0)
    val init = Similarity.kmeansFit(emb, k = 8, iters = 0)
    val trained = Similarity.kmeansFit(emb, k = 8, iters = 3)
    val (o0, o3) = (objective(init), objective(trained))
    info(s"spherical k-means objective: init $o0 -> trained $o3")
    assert(trained.count() == 8)
    assert(o3 > o0, s"$o0 -> $o3")
    // trained centroids are unit vectors (cosine geometry preserved)
    val norms = trained.select(Similarity.norm($"embedding").as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
    // deterministic: same seed, same centroids
    val again = Similarity.kmeansFit(emb, k = 8, iters = 3)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val first = trained.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(again == first)
    // composes with the probe search
    val res = Similarity.ivfTopK(emb, trained, emb.where($"vec_id" < 3), k = 3, nprobe = 2)
    assert(res.count() == 9)
  }

  test("kmeansFit: empty cluster and zero-norm mean both keep the previous centroid") {
    // all mass near +x: the -x centroid gets no assignments -> unchanged
    // (the branch the SQL oracle deliberately does not encode)
    val corpus = Seq((10L, Seq(1f, 0f)), (11L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val init = Seq((0L, Seq(1f, 0f)), (1L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansFit(corpus, k = 2, iters = 2, init = Some(init))
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(got(1L) == Seq(-1f, 0f))
    // opposing unit vectors: the lone cluster's mean is zero-norm -> unchanged
    val corpus2 = Seq((1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val init2 = Seq((0L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val got2 = Similarity.kmeansFit(corpus2, k = 1, iters = 1, init = Some(init2))
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(got2(0L) == Seq(0f, 1f))
  }

  test("hyperplaneNearDupPairs finds the planted duplicate across any table") {
    val dup = emb.where($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val got = Similarity.hyperplaneNearDupPairs(emb.unionByName(dup),
      threshold = 0.99, dim = 64, bits = 8, tables = 2).collect()
    // identical vectors share every bucket in every table
    assert(got.exists(r =>
      r.getAs[Long]("i") == 0L && r.getAs[Long]("j") == 9999L &&
        r.getAs[Double]("sim") == 1.0))
    assert(got.forall(r => r.getAs[Long]("i") < r.getAs[Long]("j")))
    // pairs are emitted once even when they collide in both tables
    assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length == got.length)
  }

  test("semanticDedup: τ-close same-cluster vectors drop, cross-cluster twins both survive") {
    def v(dims: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(4)(0f); dims.foreach { case (i, x) => a(i) = x }; a.toSeq
    }
    // two orthogonal centroids; 1 and 2 are identical (cluster 0),
    // 3 sits in cluster 1, 4 is its near-orthogonal cluster-mate
    val corpus = Seq(
      (1L, v(0 -> 1f)), (2L, v(0 -> 1f)),
      (3L, v(1 -> 1f)), (4L, v(1 -> 0.1f, 2 -> 1f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0L, v(0 -> 1f)), (1L, v(1 -> 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(corpus, centroids, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (0L, true)) // lowest id survives
    assert(got(2L) == (0L, false)) // its τ-close successor drops
    assert(got(3L) == (1L, true))
    assert(got(4L) == (1L, true)) // same cluster but cos ≈ 0.1 < τ
    // the SAME vectors with one centroid still keep 3 and 4: cluster
    // membership alone never drops anything — similarity does
    val one = Similarity.semanticDedup(
        corpus, centroids.where($"vec_id" === 0), threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(one(3L) && one(4L) && !one(2L))
  }

  test("knnGraph: planted twin ranks first at sim 1, k bounds neighbors, graph covers bucket-mates only") {
    val dup = emb.where($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val g = Similarity.knnGraph(emb.unionByName(dup), k = 3,
      dim = 64, bits = 6, tables = 2, seed = 7L)
    val rows = g.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.values.forall(_.length <= 3))
    // ranks are dense 1..n within every query vertex
    assert(byQ.values.forall(rs =>
      rs.map(_.getAs[Int]("rank")).toSet == (1 to rs.length).toSet))
    // the twin pair collides in every table: both directions rank 1, sim 1
    val q0 = byQ(0L).find(_.getAs[Int]("rank") == 1).get
    assert(q0.getAs[Long]("neighbor_id") == 9999L && q0.getAs[Double]("sim") == 1.0)
    val q9 = byQ(9999L).find(_.getAs[Int]("rank") == 1).get
    assert(q9.getAs[Long]("neighbor_id") == 0L && q9.getAs[Double]("sim") == 1.0)
    // every q_id appears at most once per neighbor (cross-table dedup)
    assert(rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .distinct.length == rows.length)
  }
}

class TextStatsSpec extends SparkSuite {
  import spark.implicits._

  test("quality features on a known doc") {
    val df = Seq((1L, "the cat sat of a mat")).toDF("doc_id", "text")
    val r = TextStats.quality(df).collect().head
    assert(r.getAs[Int]("n_words") == 6)
    assert(r.getAs[Double]("avg_word_len") == 2.5) // 15 letters / 6 words
    assert(r.getAs[Double]("stopword_ratio") == 0.5) // the, of, a
  }

  private def round4(d: Double): Double = math.round(d * 10000).toDouble / 10000

  test("qualityScore / langPredicted column forms ≡ quality() / langId() (r13 fusion)") {
    // doc_filter_pipeline fuses these as row-wise columns; they must
    // stay expression-identical to the per-signal operators
    val docs = Tables.documents(spark, sf)
    val profiles = Seq(
      "p1" -> Seq("the", "of", "and"), "p2" -> Seq("le", "la", "et"))
    val ws = TextStats.words(col("text"))
    val fused = docs.select($"doc_id",
        TextStats.qualityScore(ws).as("qs"),
        TextStats.langPredicted(ws, profiles).as("pred"))
      .as[(Long, Double, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val q = TextStats.quality(docs).select($"doc_id", $"quality_score")
      .as[(Long, Double)].collect().toMap
    val l = TextStats.langId(docs, profiles).select($"doc_id", $"predicted")
      .as[(Long, String)].collect().toMap
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      assert(fused(id)._1 == q(id), s"doc $id quality")
      assert(fused(id)._2 == l(id), s"doc $id lang")
    }
  }

  test("repetition: top-word and duplicate-bigram fractions; no bigrams -> null") {
    val df = Seq((1L, "a a a b"), (2L, "solo")).toDF("doc_id", "text")
    val r = TextStats.repetition(df).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Long]("n_words") == 4)
    assert(r(1L).getAs[Long]("n_distinct_words") == 2)
    assert(r(1L).getAs[Double]("top_word_ratio") == 0.75)
    // bigrams "a a", "a a", "a b": 3 total, 2 distinct
    assert(r(1L).getAs[Double]("dup_bigram_ratio") == round4(1.0 - 2.0 / 3))
    assert(r(2L).getAs[Double]("top_word_ratio") == 1.0)
    assert(r(2L).isNullAt(r(2L).fieldIndex("dup_bigram_ratio")))
  }

  test("entropy: uniform doc hits ln(k), constant doc hits zero") {
    val df = Seq(
      (1L, "a b c d"),      // 4 distinct, uniform -> ln(4)
      (2L, "x x x x"),      // constant -> 0
      (3L, "a a b"))        // -(2/3 ln 2/3 + 1/3 ln 1/3)
      .toDF("doc_id", "text")
    val got = TextStats.entropy(df)
      .select("doc_id", "n_distinct", "n_words", "entropy")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 4L, BigDecimal(math.log(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) == ((2L, 1L, 4L, 0.0)))
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(got(3L)._4 - h3) < 1e-3)
  }

  test("sourceStats: dup-aware per-source rollup") {
    val df = Seq(
      (1L, "same text", "en", "s1", 9L),
      (2L, "same text", "en", "s1", 9L), // exact dup within s1
      (3L, "other", "fr", "s1", 5L),
      (4L, "x", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.sourceStats(df).collect()
      .map(row => row.getAs[String]("source") -> row).toMap
    assert(r("s1").getAs[Long]("n_docs") == 3)
    assert(r("s1").getAs[Long]("n_unique") == 2)
    assert(r("s1").getAs[Long]("sum_chars") == 23)
    assert(r("s1").getAs[Long]("n_langs") == 2)
    assert(r("s2").getAs[Long]("n_docs") == 1)
  }

  test("weightedSample: per-source rates honored, decision is content-stable") {
    val df = (1L to 60L).map { i =>
      val src = if (i <= 20) "all" else if (i <= 40) "none" else "half"
      (i, s"text $i", "en", src, 6L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = TextStats.weightedSample(df, Seq("all" -> 1.0, "none" -> 0.0), 0.5)
      .select("doc_id", "source", "sample_hash")
      .as[(Long, String, Long)].collect()
    val bySrc = kept.groupBy(_._2)
    assert(bySrc("all").map(_._1).toSet == (1L to 20L).toSet) // rate 1: everything
    assert(!bySrc.contains("none"))                           // rate 0: nothing
    // default stratum: exactly the ids whose salted hash is under 5000
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long): Long = {
      val hex = md.digest(s"mix:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    val expect = (41L to 60L).filter(h(_) < 5000).toSet
    assert(bySrc.get("half").map(_.map(_._1).toSet).getOrElse(Set.empty) == expect)
    // growth-stability: adding rows never flips an existing decision
    val kept2 = TextStats.weightedSample(df.limit(50), Seq("all" -> 1.0, "none" -> 0.0), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == kept.map(_._1).filter(_ <= 50).toSet)
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fps = TextStats.fingerprint(df).as[(Long, Long)].collect().toMap
    assert(fps(1L) != fps(2L))
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    // "rare" appears in 1 of 3 docs, "common" in all 3; doc 1 has both
    // at tf=1, so rare must outrank common; ties break on the term
    val df = Seq(
      (1L, "common rare"),
      (2L, "common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val got = TextStats.tfidfTopK(df, k = 2)
      .select("doc_id", "rank", "term", "tf", "df")
      .as[(Long, Int, String, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got(1L) == Seq("rare", "common"))
    // idf is corpus-relative: df("common") = 3 everywhere
    val dfs = TextStats.tfidfTopK(df, k = 2)
      .where($"term" === "common").select("df").as[Long].collect()
    assert(dfs.forall(_ == 3L))
  }

  test("unigramLogProb: hand-computed smoothed LM, common vocab scores lower ppl") {
    // cf: a=2, b=2, c=1; T=5, V=3 → p(a)=p(b)=3/8, p(c)=2/8
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextStats.unigramLogProb(df)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L && got(2L)._2 == 2L)
    val nll1 = -math.log(3.0 / 8) // all three tokens at p=3/8
    val nll2 = -(math.log(3.0 / 8) + math.log(2.0 / 8)) / 2
    assert(math.abs(got(1L)._3 - nll1) < 1e-4)
    assert(math.abs(got(2L)._3 - nll2) < 1e-4)
    // the rarer vocabulary of doc 2 shows up as higher perplexity
    assert(got(2L)._4 > got(1L)._4)
    assert(math.abs(got(1L)._4 - math.exp(got(1L)._3)) < 1e-3)
  }

  test("bigramLogProb: independent cross-corpus model agrees; backoff and OOV branches fire") {
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
    // score docs: (b,a) is an unseen bigram of seen terms -> backoff;
    // "z" is out-of-vocabulary -> add-one cf=0 smoothing
    val score = Seq((10L, "a b"), (11L, "b a"), (12L, "a z"))
    // independent reimplementation of the documented formula
    val toks = train.flatMap(_._2.split("\\s+"))
    val cf = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val T = toks.size.toLong; val V = cf.size.toLong
    def pu(w: String) = (cf.getOrElse(w, 0L) + 1).toDouble / (T + V)
    val cf2 = train.flatMap { case (_, t) =>
      val ws = t.split("\\s+"); ws.zip(ws.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def nll(text: String): Double = {
      val ws = text.split("\\s+")
      val scores = pu(ws.head) +: ws.zip(ws.drop(1)).map { case (p, c) =>
        cf2.get((p, c)) match {
          case Some(n) => n.toDouble / cf(p)
          case None => 0.4 * pu(c)
        }
      }
      val s = -scores.map(math.log).sum / ws.length
      math.round(s * 10000).toDouble / 10000
    }
    val got = TextStats.bigramLogProb(
        score.toDF("doc_id", "text"), train.toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    score.foreach { case (id, t) =>
      assert(math.abs(got(id) - nll(t)) < 1e-9, s"doc $id: ${got(id)} vs ${nll(t)}")
    }
    // the three branches produce strictly ordered likelihoods here:
    // seen bigram < backoff of seen terms < OOV continuation
    assert(got(10L) < got(11L) && got(11L) < got(12L))
  }

  test("multimodal decode parses the binary container per row") {
    val meta = Multimodal.decodeMeta(spark, Tables.documents(spark, sf)).collect()
    assert(meta.length == 500)
    assert(meta.forall(m => m.width >= 640 && m.width < 768 && m.n_frames >= 1))
    assert(meta.forall(m => m.byte_len > 0))
  }

  test("GFT1 container: Spark-encoded header round-trips through the byte parser") {
    import spark.implicits._
    val docs = Seq((7L, "hello spark")).toDF("doc_id", "text")
    val payload = Multimodal.withPayload(docs)
      .select("payload").as[Array[Byte]].head()
    // layout: 4B magic + 4B width + 4B height + 2B frames + media bytes
    assert(payload.length == Multimodal.HeaderLen + 11)
    assert(new String(payload.take(4), "US-ASCII") == "GFT1")
    val m = Multimodal.decode(7L, payload)
    assert(m.byte_len == 11)
    assert(m.width == 640 + 11 % 128)
    assert(m.height == 360 + 'h'.toInt % 72)
    assert(m.n_frames == 1 + 'k'.toInt % 30)
    // a corrupted magic is rejected, proving the parser reads structure
    val bad = payload.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException] { Multimodal.decode(7L, bad) }
  }

  test("frameSample slices sampled frames relationally, bytes verified against the model") {
    import spark.implicits._
    // "hello spark" -> media 11B, n_frames = 1 + 'k' % 30 = 1 + 107 % 30 = 18
    // frame_len = 11 / 18 = 0: frames 0..16 empty, frame 17 carries all 11
    val docs = Seq((7L, "hello spark"), (8L, "abcdef")).toDF("doc_id", "text")
    val got = Multimodal.frameSample(docs, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    def md5(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got((7L, 0L)) == (0L, md5("")))
    // doc 8: media "abcdef" 6B, n_frames = 1 + 'f'(102) % 30 = 13 ->
    // frame_len 0, last frame idx 12 holds everything; stride 2 hits it
    assert(got((8L, 12L)) == (6L, md5("abcdef")))
    // a doc where frames are non-trivial: 26 chars, last char 'z'(122) ->
    // n_frames = 1 + 122 % 30 = 3, frame_len 8, frames 0 and 2 sampled
    val alpha = Seq((9L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
    val g2 = Multimodal.frameSample(alpha, stride = 2)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getString(3)))).toMap
    assert(g2(0L) == (8L, md5("abcdefgh")))
    assert(g2(2L) == (10L, md5("qrstuvwxyz"))) // tail remainder rides the last frame
    assert(!g2.contains(1L)) // stride skipped it
  }

  test("frameSample consumes a pre-encoded payload column and rejects a corrupt magic") {
    import spark.implicits._
    // the served shape: payloads arrive already encoded — frameSample
    // must use the column as-is, and the result must match the
    // synthesized-from-text path byte for byte
    val withP = Multimodal.withPayload(
      Seq((9L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text"))
    val fromPayload = Multimodal.frameSample(withP, stride = 2)
      .collect().map(_.toSeq).toSeq
    val fromText = Multimodal.frameSample(withP.drop("payload"), stride = 2)
      .collect().map(_.toSeq).toSeq
    assert(fromPayload == fromText && fromPayload.nonEmpty)

    // a corrupt magic fails loudly: the check gates the n_frames parse,
    // so column pruning cannot drop it (ADVICE r4: the old standalone
    // __magic_ok column was pruned away and never fired)
    val bad = withP.withColumn("payload",
      concat(lit("XXXX".getBytes("US-ASCII")),
        expr("substring(payload, 5, octet_length(payload) - 4)")))
    val e = intercept[Throwable] { Multimodal.frameSample(bad, stride = 2).collect() }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("bad magic for doc 9")), chain(e).mkString(" | "))
  }

  test("resizeHalf: halved dims, every-2nd-byte media, md5-verified") {
    import spark.implicits._
    val docs = Seq((7L, "hello spark")).toDF("doc_id", "text")
    val r = Multimodal.resizeHalf(spark, docs).collect().head
    assert(r.width == (640 + 11 % 128) / 2)
    assert(r.height == (360 + 'h'.toInt % 72) / 2)
    assert(r.n_frames == 1 + 'k'.toInt % 30)
    assert(r.byte_len == 6) // "hlosak".length
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("hlosak".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.payload_md5 == want)
  }
}
