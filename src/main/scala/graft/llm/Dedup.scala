package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators: exact, MinHash+LSH, SimHash, and
  * n-gram Jaccard. Designed for the 100 TB shape of the problem:
  *
  *  - exact dedup is one hash-groupBy (map-side partial, no pairwise);
  *  - n-gram Jaccard joins through an inverted shingle index, so only
  *    pairs sharing at least one shingle are ever materialized;
  *  - MinHash LSH banding caps candidate generation at documents sharing
  *    a band key — the classic sub-quadratic near-dup pipeline
  *    (shingle → minhash → band → bucket-join → verify);
  *  - SimHash is a single linear pass producing a 32-bit signature whose
  *    hamming distance approximates cosine similarity of token sets.
  */
object Dedup {

  import TextStats.{wordHash, words}

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = words(text)
    // guard: sequence(1, 0) would produce a *descending* [1,0] in Spark
    when(size(ws) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup groups: content hash -> surviving (minimum) doc_id and
    * group size. Survivors = `where(group_size == 1 or doc_id == survivor)`. */
  def exact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min("doc_id").as("survivor"), count(lit(1)).as("group_size"))

  /** Per-doc distinct shingle sets (cached building block). */
  def docShingles(df: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))

  /** Near-duplicate pairs by true n-gram Jaccard >= threshold, generated
    * through an inverted shingle index (no all-pairs). */
  def ngramJaccardPairs(
      df: DataFrame,
      n: Int = 3,
      threshold: Double = 0.4,
      textCol: String = "text"): DataFrame = {
    val docs = docShingles(df, n, textCol)
    val inv = docs.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    val a = inv.select(col("shingle"), col("doc_id").as("i"), col("n_sh").as("ni"))
    val b = inv.select(col("shingle"), col("doc_id").as("j"), col("n_sh").as("nj"))
    a.join(b, Seq("shingle"))
      .where(col("i") < col("j"))
      .groupBy("i", "j", "ni", "nj")
      .agg(count(lit(1)).as("inter"))
      .withColumn(
        "jaccard",
        round(col("inter").cast("double") / (col("ni") + col("nj") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** Seeded linear-permutation parameters (a, b) for MinHash, shared
    * with the oracle SQL. Modulus is prime and < 2^28 so a*x+b stays
    * far from long overflow. */
  val MINHASH_MOD: Long = 268435399L
  def permutations(k: Int = 16, seed: Long = 42L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(k)((1L + r.nextInt((MINHASH_MOD - 1).toInt).toLong,
      r.nextInt((MINHASH_MOD - 1).toInt).toLong))
  }

  /** MinHash signature column: for each permutation, the min of
    * `(a * shingleHash + b) mod M` over the doc's shingles. */
  def minhashSignature(sh: Column, perms: Seq[(Long, Long)]): Column =
    array(perms.map { case (a, b) =>
      array_min(transform(sh, s => (lit(a) * wordHash(s) + lit(b)) % MINHASH_MOD))
    }: _*)

  /** MinHash-LSH near-dup pairs: band the signature, bucket-join on
    * (band, key), verify candidates with true Jaccard. `bands * rows`
    * must equal the permutation count. */
  def minhashLshPairs(
      df: DataFrame,
      perms: Seq[(Long, Long)] = permutations(),
      bands: Int = 4,
      threshold: Double = 0.4,
      n: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(perms.length % bands == 0, "bands must divide the signature length")
    val rows = perms.length / bands
    val docs = docShingles(df, n, textCol)
      .withColumn("sig", minhashSignature(col("sh"), perms))
    val banded = docs.select(
      col("doc_id"), col("sh"), col("n_sh"),
      posexplode(
        array((0 until bands).map(bi =>
          concat_ws("-", (0 until rows).map(ri => col("sig")(bi * rows + ri)): _*)): _*))
        .as(Seq("band", "band_key")))
    val a = banded.select(
      col("band"), col("band_key"),
      col("doc_id").as("i"), col("sh").as("sh_i"), col("n_sh").as("ni"))
    val b = banded.select(
      col("band"), col("band_key"),
      col("doc_id").as("j"), col("sh").as("sh_j"), col("n_sh").as("nj"))
    val candidates = a.join(b, Seq("band", "band_key"))
      .where(col("i") < col("j"))
      .select("i", "j", "sh_i", "sh_j", "ni", "nj")
      .dropDuplicates("i", "j")
    candidates
      .withColumn("inter", size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn(
        "jaccard",
        round(col("inter").cast("double") / (col("ni") + col("nj") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** 32-bit SimHash over word-token hashes (with multiplicity): bit b is
    * the sign of the sum of ±1 contributions from each token's bit b. */
  def simhash(df: DataFrame, textCol: String = "text"): DataFrame = {
    val whs = transform(words(col(textCol)), wordHash(_))
    val bitSum: Int => Column = b =>
      aggregate(
        transform(whs, h => (shiftright(h, b) % 2) * 2 - 1),
        lit(0L), (acc, x) => acc + x)
    val sim = (0 until 32).map(b =>
      when(bitSum(b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    df.select(col("doc_id"), sim.as("simhash"))
  }
}
