package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers, mirroring how ANN systems scale:
  *  - [[cosineTopK]]: brute force — exact, O(|queries| × |corpus|); the
  *    baseline, and fine whenever the query set broadcasts.
  *  - [[signLshTopK]]: sign-bit bucketing (axis-aligned random
  *    hyperplanes) — candidates are restricted to the query's bucket, so
  *    the join is an equi-join on `bucket` instead of a cross join.
  *  - [[ivfAssign]]/[[ivfTopK]]: IVF coarse quantizer — every vector is
  *    assigned to its nearest centroid; a query probes the `nprobe`
  *    nearest lists only. At 100 TB the lists are the partition key, so
  *    a probe is a partition-pruned scan, not a full pass.
  *
  * All arithmetic is done in double precision via native Catalyst
  * higher-order functions (`zip_with` + `aggregate` — interpreted-eval
  * expressions, but UDF-free, null-safe, and fully distributable).
  */
object Similarity {

  /** Double-precision dot product of two float/double-array columns —
    * the native codegen'd [[graft.catalyst.ArrayDot]] expression. Its
    * null/length/summation semantics are EXACTLY the
    * `zip_with`+`aggregate` fold it replaced (left-to-right from +0.0,
    * per-element float→double widening, null poisoning), so every
    * result is bit-identical to the interpreted form and to the DuckDB
    * oracles' list folds — but the per-pair cost drops ~4× (no lambda
    * dispatch, no per-element boxing), which is THE constant on ANN
    * candidate joins. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.columnFn {
      case Seq(l, r) => graft.catalyst.ArrayDot(l, r)
    }(a, b)

  /** sqrt(Σx²) via [[dot]](a, a): the self-product per element is the
    * same `x.cast·x.cast` term the previous fold accumulated, in the
    * same order — bit-identical. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed-norm pair: the norms are hoisted to one
    * computation per *row* before a join instead of one per candidate
    * *pair* inside it — same expression tree, so bit-identical results,
    * but the per-pair work drops from three array aggregates to one. */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "sim")
  }

  /** Exact top-k: broadcast the query set against the corpus. `sim` is
    * cosine rounded to 4dp (rank ties broken by neighbor id) so results
    * are reproducible across engines and summation orders. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm")))
    val scored = corpus
      .withColumn("c_nrm", norm(col("embedding")))
      .join(q, col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm")), 4).as("sim"))
    ranked(scored, k)
  }

  /** Sign-bit LSH bucket of the first `bits` dimensions — axis-aligned
    * planes. Kept as the cheap fixed configuration for the bench oracle
    * queries; it caps at 2^bits dimension-biased buckets, so the scale
    * path is [[randomPlanes]]/[[planeBucket]] (seeded random hyperplanes,
    * arbitrary `bits`, multi-table union for recall). */
  def signBucket(emb: Column, bits: Int = 4): Column =
    (0 until bits).map(i => when(emb(i) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Seeded random hyperplanes: `bits` gaussian direction vectors. The
    * seed makes buckets reproducible across runs/engines (the oracle SQL
    * inlines the same values). */
  def randomPlanes(dim: Int, bits: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket: bit i = sign of ⟨emb, plane_i⟩.
    * P[bit collision] = 1 - θ/π for angle θ — the classic SimHash-for-
    * cosine guarantee, unbiased in direction (unlike [[signBucket]]). */
  def planeBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** `tables` independent bucket ids per row, exploded to
    * `(__tbl, __bucket)` — candidates collide in ANY table, trading
    * `tables`× hashing for recall `1-(1-p^bits)^tables`. */
  private def explodeBuckets(
      df: DataFrame, dim: Int, bits: Int, tables: Int, seed: Long): DataFrame =
    df.select(
      col("*"),
      posexplode(array((0 until tables).map(t =>
        planeBucket(col("embedding"), randomPlanes(dim, bits, seed + t))): _*))
        .as(Seq("__tbl", "__bucket")))

  /** Approximate top-k via random-hyperplane LSH, multi-table: score only
    * candidates sharing a bucket with the query in at least one table.
    * The join is an equi-join on (table, bucket); per-pair work is one
    * dot product (norms hoisted). At corpus scale, `bits` sizes the
    * buckets (E[bucket] = n / 2^bits) and `tables` buys recall back. */
  def hyperplaneLshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      bits: Int = 16,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val c = explodeBuckets(corpus, dim, bits, tables, seed)
      .withColumn("c_nrm", norm(col("embedding")))
    val q = broadcast(
      explodeBuckets(queries, dim, bits, tables, seed)
        .select(
          col("__tbl"), col("__bucket"),
          col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          norm(col("embedding")).as("q_nrm")))
    // score before the cross-table dedup (sim is table-independent) so
    // the dedup exchange moves 24-byte rows, not embedding vectors;
    // single-table configurations skip it
    val scored0 = c.join(q, Seq("__tbl", "__bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm")), 4).as("sim"))
    val scored =
      if (tables == 1) scored0 else scored0.dropDuplicates("q_id", "neighbor_id")
    ranked(scored, k)
  }

  /** Near-duplicate pairs via random-hyperplane LSH — the scale-safe
    * version of [[cosineNearDupPairs]]: Σ_b n_b² with n_b ≈ n/2^bits,
    * and `bits` is free (not capped by the embedding's leading dims). */
  def hyperplaneNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      dim: Int,
      bits: Int = 16,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val b = explodeBuckets(corpus, dim, bits, tables, seed)
      .withColumn("nrm", norm(col("embedding")))
    val lhs = b.select(col("__tbl"), col("__bucket"), col("vec_id").as("i"),
      col("embedding").as("e_i"), col("nrm").as("n_i"))
    val rhs = b.select(col("__tbl"), col("__bucket"), col("vec_id").as("j"),
      col("embedding").as("e_j"), col("nrm").as("n_j"))
    // threshold + slim BEFORE the cross-table dedup: the exchange sees
    // only the (i, j, sim) rows that already cleared the similarity
    // bar — at near-dup thresholds a tiny fraction of candidates
    val pairs = lhs.join(rhs, Seq("__tbl", "__bucket"))
      .where(col("i") < col("j"))
      .select(col("i"), col("j"),
        round(cosinePre(col("e_i"), col("e_j"), col("n_i"), col("n_j")), 4).as("sim"))
      .where(col("sim") >= threshold)
    if (tables == 1) pairs else pairs.dropDuplicates("i", "j")
  }

  /** Approximate top-k: only candidates in the query's sign bucket are
    * scored. Recall < 1 by design; the cross join becomes an equi-join. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 4): DataFrame = {
    val c = corpus
      .withColumn("bucket", signBucket(col("embedding"), bits))
      .withColumn("c_nrm", norm(col("embedding")))
    val q = broadcast(
      queries.select(
        col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        signBucket(col("embedding"), bits).as("bucket"),
        norm(col("embedding")).as("q_nrm")))
    val scored = c.join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm")), 4).as("sim"))
    ranked(scored, k)
  }

  /** IVF coarse assignment: nearest centroid (max cosine; ties -> lowest
    * centroid id) per vector.
    *
    * The centroid set is index metadata — driver-sized by definition
    * (k ≈ hundreds even at 100 TB corpus scale; [[ivfWrite]] already
    * `coalesce(1)`s it) — so it is collected once and INLINED into a
    * per-row argmax expression: `array_max` over k `(sim, -id, id)`
    * structs picks max-sim / lowest-id in one codegen-friendly pass.
    * No join, no shuffle, no per-vector sort: the corpus is touched
    * exactly once and the output stays partitioned like the input.
    * (The previous shape — crossJoin + `row_number` window — shuffled
    * corpus×k rows and sorted per vector: 256× the corpus at k=256.)
    *
    * Numeric parity: the centroid norm is computed driver-side with the
    * same left-fold as [[norm]], so `sim` is bit-identical to the
    * joined formulation and to the oracle. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignInlined(corpus, collectCentroids(centroids))
      .select("vec_id", "centroid_id", "sim")

  /** Collect the (tiny, by construction) centroid table to the driver,
    * ordered by id so tie-break folds deterministically. */
  private def collectCentroids(centroids: DataFrame): Seq[(Long, Seq[Float])] =
    centroids.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
      .toSeq

  /** Per-row nearest-centroid over inlined centroid literals: appends
    * `(centroid_id, sim)` to every corpus row with zero shuffles —
    * fused into ONE native expression ([[graft.catalyst.NearestCentroid]],
    * a primitive k × dim loop per row) replacing the previous k-struct
    * `array_max` tree, assignment pinned bit-identical (same dot/norm
    * folds, 4dp rounding before the argmax, lowest-id ties). */
  private def assignInlined(corpus: DataFrame, cs: Seq[(Long, Seq[Float])]): DataFrame = {
    require(cs.nonEmpty, "assignInlined needs at least one centroid")
    corpus
      .withColumn("__best",
        org.apache.spark.sql.graft.bridge.columnFn {
          case Seq(c) => graft.catalyst.NearestCentroid(c, cs)
        }(col("embedding")))
      .withColumn("centroid_id", col("__best.centroid_id"))
      .withColumn("sim", col("__best.sim"))
      .drop("__best")
  }

  /** Embedding-cosine near-duplicate pairs: `(i, j, sim)` with i < j and
    * cosine >= threshold, candidates restricted to pairs sharing a sign
    * bucket (the LSH near-dup analogue of [[Dedup.minhashLshPairs]] for
    * dense vectors). The self-join is an equi-join on `bucket`, so cost
    * is Σ_bucket n_b² instead of n² — at corpus scale, raise `bits` to
    * keep buckets bounded and union several hyperplane seeds to recover
    * recall. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, bits: Int = 4): DataFrame = {
    val b = corpus.select(
      col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"),
      norm(col("embedding")).as("nrm"))
    val lhs = b.select(col("bucket"), col("vec_id").as("i"),
      col("embedding").as("e_i"), col("nrm").as("n_i"))
    val rhs = b.select(col("bucket"), col("vec_id").as("j"),
      col("embedding").as("e_j"), col("nrm").as("n_j"))
    lhs.join(rhs, Seq("bucket"))
      .where(col("i") < col("j"))
      .select(col("i"), col("j"),
        round(cosinePre(col("e_i"), col("e_j"), col("n_i"), col("n_j")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * deduplication: cluster the corpus with the IVF coarse quantizer,
    * then inside each cluster mark every vector that has a τ-close
    * (cosine ≥ threshold) predecessor in vec_id order as a duplicate —
    * the deterministic survivor rule (the paper keeps one arbitrary
    * representative per ε-group; id order makes the choice reproducible
    * across runs and engines, like [[graft.llm.Dedup.dedupSurvivors]]).
    *
    * Output: one row per corpus vector — `(vec_id, centroid_id, keep)`.
    *
    * Scale: pairwise work is Σ_c n_c², never n² — k (the centroid
    * count) is the knob that bounds cluster size (SemDeDup's own
    * prescription: k ≈ n / target-cluster-size), the per-cluster join
    * is an equi-join on `centroid_id` (AQE-skew-splittable), and the
    * dropped set joins back by vec_id. Assignment is the zero-shuffle
    * inlined argmax ([[ivfAssign]]). */
  def semanticDedup(
      corpus: DataFrame,
      centroids: DataFrame,
      threshold: Double): DataFrame = {
    val assigned = assignInlined(corpus, collectCentroids(centroids))
      .withColumn("nrm", norm(col("embedding")))
      .select(col("centroid_id"), col("vec_id"), col("embedding"), col("nrm"))
    val lhs = assigned.select(col("centroid_id"), col("vec_id").as("i"),
      col("embedding").as("e_i"), col("nrm").as("n_i"))
    val rhs = assigned.select(col("centroid_id"), col("vec_id").as("j"),
      col("embedding").as("e_j"), col("nrm").as("n_j"))
    val dropped = lhs.join(rhs, Seq("centroid_id"))
      .where(col("i") < col("j"))
      .where(round(cosinePre(col("e_i"), col("e_j"), col("n_i"), col("n_j")), 4)
        >= threshold)
      .select(col("j").as("vec_id")).distinct()
      .withColumn("__dup", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid_id"),
        coalesce(!col("__dup"), lit(true)).as("keep"))
  }

  /** k-NN graph over the WHOLE corpus — every vector's top-k cosine
    * neighbors restricted to shared random-hyperplane buckets: the
    * input graph for graph-based dedup clustering, label propagation,
    * and diversity analysis (and the batch analogue of an NN-Descent
    * seed pass). Unlike [[hyperplaneLshTopK]] the query side IS the
    * corpus, so nothing broadcasts: the candidate generator is a
    * symmetric self-equi-join on `(table, bucket)` — Σ_b n_b² pairs,
    * with `bits` sizing buckets and `tables` buying recall — and the
    * per-vector top-k is one window over candidate pairs. */
  def knnGraph(
      corpus: DataFrame,
      k: Int,
      dim: Int,
      bits: Int = 16,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val b = explodeBuckets(corpus, dim, bits, tables, seed)
      .withColumn("nrm", norm(col("embedding")))
    val lhs = b.select(col("__tbl"), col("__bucket"), col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val rhs = b.select(col("__tbl"), col("__bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    // score BEFORE the cross-table dedup so its shuffle carries
    // (q, n, sim) — 24 bytes — instead of two embedding vectors per
    // pair; a pair's sim is table-independent, so keeping any one
    // duplicate is exact. tables == 1 cannot produce duplicates and
    // skips the exchange entirely.
    val scored0 = lhs.join(rhs, Seq("__tbl", "__bucket"))
      .where(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        round(cosinePre(col("q_emb"), col("n_emb"), col("q_nrm"), col("n_nrm")), 4).as("sim"))
    val scored =
      if (tables == 1) scored0 else scored0.dropDuplicates("q_id", "neighbor_id")
    ranked(scored, k)
  }

  /** Symmetric per-vector scalar quantization to int8: scale =
    * max(|x|)/127, codes = round(x/scale) — the storage-reduction step
    * every large embedding corpus takes (4 bytes -> 1 byte per dim)
    * before IVF/LSH indexing. Per-vector scales cancel in cosine, so
    * [[cosine]] over the raw `codes` arrays equals cosine of the
    * dequantized vectors — search runs on 1-byte codes directly. The
    * scale is bound to a column first so the transform lambda reads it
    * once per row, not once per element. Output:
    * `(vec_id, codes array<int>, scale double)`. */
  def quantized(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("scale",
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0)
      .select(
        col("vec_id"),
        transform(col("embedding"), x =>
          when(col("scale") === 0.0, lit(0))
            .otherwise(round(x.cast("double") / col("scale")).cast("int")))
          .as("codes"),
        col("scale"))

  /** Train the IVF coarse quantizer with Lloyd's k-means in cosine
    * space (spherical k-means): one Spark pass per iteration —
    * inlined-centroid per-row assignment (same max-cosine / lowest-id
    * rule as [[ivfAssign]], zero shuffles) → per-centroid per-dimension
    * mean → renormalize. Only the k×dim centroid matrix ever touches
    * the driver (tiny by construction); the per-dimension mean is a
    * posexplode + hash aggregate, map-side combined, so the shuffle
    * carries k×dim partial sums per task, not vectors. Empty clusters
    * keep their previous centroid. Deterministic: init is the k corpus
    * vectors with the smallest seeded hash — or, when `init` is given,
    * its vectors in vec_id order (the SQL-expressible form a
    * cross-engine oracle needs: seeded-hash order is engine-specific,
    * an explicit init frame is not).
    *
    * Returns `(vec_id = centroid_id, embedding)` shaped for
    * [[ivfAssign]]/[[ivfTopK]].
    */
  def kmeansFit(
      corpus: DataFrame,
      k: Int,
      iters: Int,
      seed: Long = 42L,
      init: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    def toDf(cs: Seq[(Long, Seq[Float])]): DataFrame =
      cs.toDF("vec_id", "embedding")

    // seeded deterministic init: k distinct corpus vectors by hash order
    var centroids: Seq[(Long, Seq[Float])] = init match {
      case Some(df) =>
        val cs = collectCentroids(df)
        require(cs.size == k, s"init has ${cs.size} vectors, expected k=$k")
        cs.zipWithIndex.map { case ((_, e), i) => (i.toLong, e) }
      case None => corpus
        .select(col("vec_id"), col("embedding"))
        .withColumn("__h", xxhash64(col("vec_id"), lit(seed)))
        .orderBy("__h")
        .limit(k)
        .select("vec_id", "embedding")
        .as[(Long, Seq[Float])]
        .collect().toSeq
        .zipWithIndex.map { case ((_, e), i) => (i.toLong, e) }
    }

    for (_ <- 0 until iters) {
      // inlined per-row argmax: assignment adds (centroid_id) to each
      // row with NO shuffle and no join-back (the embedding rides
      // along), so each iteration is exactly one job with one k×dim
      // aggregate shuffle (map-side combined)
      val sums = assignInlined(corpus, centroids)
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCentroid = sums.groupBy(_.getLong(0))
      centroids = centroids.map { case (cid, prev) =>
        byCentroid.get(cid) match {
          case None => (cid, prev) // empty cluster
          case Some(rows) =>
            val mean = rows.sortBy(_.getInt(1))
              .map(r => r.getDouble(2) / r.getLong(3)).toArray
            val nrm = math.sqrt(mean.map(x => x * x).sum)
            (cid,
              if (nrm == 0) prev
              else mean.map(x => (x / nrm).toFloat).toSeq)
        }
      }
    }
    toDf(centroids)
  }

  /** Double-precision squared L2 distance of two float/double-array
    * columns — the PQ metric, as the native codegen'd
    * [[graft.catalyst.ArrayL2Sq]] (same bit-parity contract as
    * [[dot]]). */
  def l2Sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.columnFn {
      case Seq(l, r) => graft.catalyst.ArrayL2Sq(l, r)
    }(a, b)

  /** Product quantization — the memory-side ANN scale path: split the
    * `dim`-dimensional space into `m` contiguous subspaces and learn a
    * `ksub`-entry codebook per subspace (Lloyd's k-means in squared
    * L2), so a vector stores as `m` small codes (m bytes at ksub ≤ 256)
    * instead of `dim` floats — the 100 TB corpus-in-RAM trick IVF lists
    * combine with ([[ivfWrite]] partitions, PQ compresses within).
    *
    * Train returns the codebook driver-side — `m × ksub × dim/m`
    * floats, index metadata by construction, the same size class as
    * [[ivfAssign]]'s centroid set. Each Lloyd iteration is ONE corpus
    * pass: the per-row inlined code assignment ([[pqEncode]]'s
    * expression, zero shuffles) feeds a per-(subspace, code, dimension)
    * mean — a hash aggregate of ≤ `dim × ksub` groups, map-side
    * combined. Empty cells keep their previous centroid.
    *
    * `init` seeds all m codebooks with the slices of its `ksub` vectors
    * in vec_id order (like [[kmeansFit]]'s explicit-init form, the
    * cross-engine-expressible choice); `iters = 0` returns the sampled
    * codebook as-is — the form the DuckDB oracle pins bit-for-bit. */
  def pqTrain(
      corpus: DataFrame,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int,
      init: DataFrame): Seq[Seq[Seq[Float]]] = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val subdim = dim / m
    val seeds = collectCentroids(init)
    require(seeds.size == ksub, s"init has ${seeds.size} vectors, expected ksub=$ksub")
    var codebook: Seq[Seq[Seq[Float]]] =
      (0 until m).map(s => seeds.map(_._2.slice(s * subdim, (s + 1) * subdim)))
    for (_ <- 0 until iters) {
      val sums = pqEncode(corpus, codebook)
        .select(col("codes"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(
          (col("pos") / subdim).cast("int").as("sub"), col("pos"),
          col("x").cast("double").as("x"), col("codes"))
        .withColumn("code", element_at(col("codes"), col("sub") + 1))
        .groupBy("sub", "code", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      codebook = codebook.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (prev, code) =>
          byCell.get((s, code)) match {
            case None => prev // empty cell
            case Some(rows) =>
              rows.sortBy(_.getInt(2))
                .map(r => (r.getDouble(3) / r.getLong(4)).toFloat).toSeq
          }
        }
      }
    }
    codebook
  }

  /** PQ encoding over an inlined codebook: appends `codes`
    * (array<int>, one per subspace — argmin squared-L2 entry, distances
    * rounded 4dp before the argmin, ties to the lowest code) to every
    * corpus row with ZERO shuffles. Fused into ONE native expression
    * ([[graft.catalyst.PqEncode]] — a primitive m × ksub × subdim loop
    * per row) replacing the previous m × ksub Catalyst
    * struct/array_min tree, with the selected codes pinned
    * bit-identical to that tree's (same subtraction/summation order,
    * same rounding, same tie rule — the oracle entries re-verified). */
  def pqEncode(corpus: DataFrame, codebook: Seq[Seq[Seq[Float]]]): DataFrame =
    corpus.withColumn("codes",
      org.apache.spark.sql.graft.bridge.columnFn {
        case Seq(c) => graft.catalyst.PqEncode(c, codebook)
      }(col("embedding")))

  /** The per-query ADC lookup table over `q_emb`: `lut[sub][code]` =
    * squared L2 (rounded 4dp) between the query's subspace slice and
    * the codebook entry — `m × ksub` doubles per query row. */
  private def pqLut(codebook: Seq[Seq[Seq[Float]]]): Column = {
    val subdim = codebook.head.head.size
    array(codebook.zipWithIndex.map { case (cb, s) =>
      array(cb.map(ce =>
        round(l2Sq(slice(col("q_emb"), s * subdim + 1, subdim), typedLit(ce)), 4)): _*)
    }: _*)
  }

  /** Approximate distance of a codes row against a `__lut` column:
    * `m` array lookups summed left-to-right. */
  private def pqAdist(m: Int): Column =
    (0 until m).map(s =>
        element_at(element_at(col("__lut"), s + 1), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)

  /** The shared ADC tail of the ad-hoc and persisted IVF+PQ paths:
    * LUT per query (built once, broadcast with the probe rows), codes
    * joined on the probed list id, m lookups per candidate, ranked —
    * ONE implementation so the "persisted twin answers IDENTICALLY"
    * oracle contract cannot desynchronize. `listed` carries
    * `(vec_id, centroid_id, codes)`. */
  private def adcScore(
      listed: DataFrame,
      probes: DataFrame,
      codebook: Seq[Seq[Seq[Float]]],
      k: Int): DataFrame = {
    val qlut = probes.select("q_id", "q_emb").distinct()
      .withColumn("__lut", pqLut(codebook))
      .select("q_id", "__lut")
    val q = broadcast(probes.select("q_id", "centroid_id").join(qlut, "q_id"))
    pqRanked(
      listed.join(q, Seq("centroid_id"))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          round(pqAdist(codebook.size), 4).as("adist")),
      k)
  }

  private def pqRanked(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adist").asc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "adist")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query builds
    * its `m × ksub` lookup table ONCE ([[pqLut]] — broadcast with the
    * query row), and a corpus row's approximate distance is `m` array
    * lookups summed — no float-vector arithmetic per pair, which is the
    * whole point of PQ: the scored relation carries codes, not
    * embeddings. Rank ascending by (distance, neighbor id). */
  def pqAdcTopK(
      encoded: DataFrame,
      codebook: Seq[Seq[Seq[Float]]],
      queries: DataFrame,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .withColumn("__lut", pqLut(codebook))
        .drop("q_emb"))
    pqRanked(
      encoded.select(col("vec_id"), col("codes")).crossJoin(q)
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          round(pqAdist(codebook.size), 4).as("adist")),
      k)
  }

  /** IVF + PQ — the canonical composed ANN index (the FAISS-style IVFPQ
    * shape, minus residual encoding: codes are over raw vectors, so
    * encoding is byte-identical to [[pqEncode]] standalone): the IVF
    * probe bounds WHICH vectors are scored (`nprobe / k_centroids` of
    * the corpus — an equi-join on the list id, partition-prunable under
    * an [[ivfWrite]]-style layout), and PQ ADC bounds HOW each is
    * scored (`m` array lookups over codes). Per-pair work has no vector
    * arithmetic anywhere: the only full-width reads are the one-pass
    * assignment+encode and the per-query LUT build. */
  def ivfPqTopK(
      corpus: DataFrame,
      centroids: DataFrame,
      codebook: Seq[Seq[Seq[Float]]],
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val encoded = pqEncode(assignInlined(corpus, collectCentroids(centroids)), codebook)
      .select("vec_id", "centroid_id", "codes")
    adcScore(encoded, ivfProbes(centroids, queries, nprobe), codebook, k)
  }

  /** The `nprobe` nearest centroid lists per query:
    * `(q_id, q_emb, q_nrm, centroid_id)` — shared by the ad-hoc and
    * persisted IVF search paths so both probe identically. */
  private def ivfProbes(centroids: DataFrame, queries: DataFrame, nprobe: Int): DataFrame = {
    val c = broadcast(centroids.select(
      col("vec_id").as("centroid_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("ct_nrm")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("c_sim").desc, col("centroid_id"))
    queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .crossJoin(c)
      .withColumn("c_sim", round(cosinePre(col("q_emb"), col("c_emb"), col("q_nrm"), col("ct_nrm")), 4))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select("q_id", "q_emb", "q_nrm", "centroid_id")
  }

  private def scoreAndRank(listed: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = listed.join(broadcast(probes), Seq("centroid_id"))
      .where(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm")), 4).as("sim"))
    ranked(scored, k)
  }

  /** IVF search: probe the `nprobe` nearest centroid lists of each query,
    * brute-force within them. Reassigns the corpus per call — fine for a
    * one-shot query, but a served index must assign ONCE: see
    * [[ivfWrite]]/[[ivfTopKPersisted]], the production path. */
  def ivfTopK(
      corpus: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    // the inlined assignment keeps the corpus columns, so the listed
    // relation needs no join back on vec_id — one pass, no shuffle
    val listed = assignInlined(corpus, collectCentroids(centroids))
      .withColumn("c_nrm", norm(col("embedding")))
    scoreAndRank(listed, ivfProbes(centroids, queries, nprobe), k)
  }

  /** Materialize the IVF index: assign every corpus vector to its
    * nearest centroid ONCE and write the corpus `partitionBy
    * (centroid_id)` (norms precomputed), centroids alongside — the
    * inverted-list layout every served IVF index uses. A probe is then
    * a partition-pruned scan of its `nprobe` list dirs; nothing is ever
    * reassigned at query time. At 100 TB this is the difference between
    * a search touching `nprobe/k_centroids` of the corpus and a search
    * recomputing an O(n·C) assignment per query batch.
    *
    * The pre-write exchange on `centroid_id` clusters each inverted
    * list into its own task: without it every input task writes a
    * sliver into every list dir — tasks × lists files (1000 executors
    * × 10k lists = 10M slivers), the classic partitioned-write
    * explosion. One shuffle of the corpus buys files-per-list ≈ 1
    * (AQE re-splits lists that outgrow a task). */
  def ivfWrite(corpus: DataFrame, centroids: DataFrame, root: String): Unit = {
    centroids.select(col("vec_id"), col("embedding"))
      .coalesce(1) // k×dim — driver-sized by construction
      .write.mode("overwrite").parquet(s"$root/centroids")
    assignInlined(corpus, collectCentroids(centroids))
      .drop("sim")
      .withColumn("c_nrm", norm(col("embedding")))
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$root/corpus")
  }

  /** Materialize the composed IVF+PQ index: one assignment + encode
    * pass, corpus persisted as m-byte codes `partitionBy(centroid_id)`
    * (the FAISS-IVFPQ on-disk shape: inverted lists of codes, raw
    * vectors not stored), centroids + codebook alongside. A probe then
    * reads ONLY its `nprobe` list dirs and touches no float vector —
    * at 100 TB the scan is `nprobe/k` of a corpus already compressed
    * `4·dim/m`-fold. Same pre-write exchange as [[ivfWrite]]
    * (files-per-list ≈ 1). */
  def ivfPqWrite(
      corpus: DataFrame,
      centroids: DataFrame,
      codebook: Seq[Seq[Seq[Float]]],
      root: String): Unit = {
    centroids.select(col("vec_id"), col("embedding"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    codebook.zipWithIndex
      .flatMap { case (cb, s) => cb.zipWithIndex.map { case (ce, code) => (s, code, ce) } }
      .toDF("sub", "code", "entry")
      .coalesce(1) // m × ksub × subdim floats — index metadata
      .write.mode("overwrite").parquet(s"$root/codebook")
    pqEncode(assignInlined(corpus, collectCentroids(centroids)), codebook)
      .select(col("vec_id"), col("centroid_id"), col("codes"))
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$root/codes")
  }

  /** ADC search over a persisted [[ivfPqWrite]] layout: probe lists
    * resolved driver-side and pushed as a static partition filter
    * (only the probed `centroid_id=` dirs are read), per-query LUT
    * built once from the persisted codebook, scoring = m array lookups
    * per candidate — byte-identical answers to the ad-hoc
    * [[ivfPqTopK]] (same codes, same LUT, same tie rule). */
  def ivfPqTopKPersisted(
      root: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$root/centroids")
    val codebook: Seq[Seq[Seq[Float]]] = spark.read.parquet(s"$root/codebook")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toSeq).toSeq)
    val probes = ivfProbes(centroids, queries, nprobe)
    val probeIds: Seq[Any] = probes.select("centroid_id").distinct()
      .collect().toSeq.map(_.get(0))
    val listed = spark.read.parquet(s"$root/codes")
      .where(col("centroid_id").isin(probeIds: _*))
    adcScore(listed, probes, codebook, k)
  }

  /** IVF search over a persisted [[ivfWrite]] layout. The probe lists
    * are resolved driver-side (≤ the centroid count — index metadata by
    * definition) and pushed as a static partition filter, so the scan
    * reads ONLY the probed `centroid_id=` dirs (`PartitionFilters` in
    * the plan; asserted in SimilaritySpec). */
  def ivfTopKPersisted(root: String, queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$root/centroids")
    val probes = ivfProbes(centroids, queries, nprobe)
    val probeIds: Seq[Any] = probes.select("centroid_id").distinct()
      .collect().toSeq.map(_.get(0))
    val listed = spark.read.parquet(s"$root/corpus")
      .where(col("centroid_id").isin(probeIds: _*))
    scoreAndRank(listed, probes, k)
  }
}
