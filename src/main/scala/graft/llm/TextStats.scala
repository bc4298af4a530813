package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, and document
  * fingerprinting. All are per-row column expressions (codegen'd, no
  * UDFs, no shuffles) — they scale linearly with the corpus and push
  * projection pruning to the scan.
  */
object TextStats {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, "\\s+")

  /** Deterministic 28-bit word hash shared with the DuckDB oracle:
    * the first 7 hex digits of md5. Small enough that linear-perm
    * minhash arithmetic never overflows a long. */
  def wordHash(w: Column): Column =
    conv(substring(md5(w), 1, 7), 16, 10).cast("long")

  /** Whitespace + BPE-ish regex token counts, plus char count. */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(words(col(textCol))).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("n_bpe_tokens"))

  /** Quality-score features (length, word stats, stopword ratio) and a
    * bounded composite score — the usual first-pass heuristic filter for
    * web-scale corpora. */
  /** The [[quality]] composite score as a COLUMN over a words-array
    * expression — exposed so multi-signal filters (doc_filter_pipeline)
    * can fuse it with other row-wise signals into ONE projection
    * instead of joining per-signal passes (guide §2.4). */
  def qualityScore(
      ws: Column,
      stopwords: Seq[String] = Seq("the", "a", "of")): Column = {
    val nWords = size(ws)
    val nStop = size(filter(ws, w => w.isin(stopwords: _*)))
    round(
      least(lit(1.0), nWords.cast("double") / 100) *
        (lit(0.5) + lit(0.5) * (nStop.cast("double") / nWords)), 4)
  }

  def quality(
      df: DataFrame,
      textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a", "of")): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val sumLen = aggregate(transform(ws, w => length(w)), lit(0), (acc, x) => acc + x)
    val nStop = size(filter(ws, w => w.isin(stopwords: _*)))
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      nWords.as("n_words"),
      round(sumLen.cast("double") / nWords, 4).as("avg_word_len"),
      round(nStop.cast("double") / nWords, 4).as("stopword_ratio"),
      qualityScore(ws, stopwords).as("quality_score"))
  }

  /** N-gram-profile language ID: score each profile by token hits,
    * predict the argmax (ties resolved by profile order). The profiles
    * are word/character n-gram sets; real deployments would learn them —
    * the operator shape (K parallel profile scores + argmax, one pass,
    * no shuffle) is what matters at scale. */
  /** The [[langId]] argmax as a COLUMN over a words-array expression
    * (ties resolved by profile order, like [[langId]]) — the fusable
    * form for one-projection multi-signal filters. */
  def langPredicted(
      ws: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = profiles.map { case (_, prof) =>
      size(filter(ws, w => w.isin(prof: _*))) }
    val best =
      if (scores.size == 1) scores.head else greatest(scores: _*)
    profiles.zip(scores).reverse.foldLeft(lit(profiles.last._1)) {
      case (els, ((name, _), sc)) => when(sc === best, lit(name)).otherwise(els)
    }
  }

  def langId(
      df: DataFrame,
      profiles: Seq[(String, Seq[String])],
      textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val scored = profiles.foldLeft(df.select(col("doc_id"), ws.as("__ws"))) {
      case (acc, (name, prof)) =>
        acc.withColumn(s"score_$name", size(filter(col("__ws"), w => w.isin(prof: _*))))
    }
    scored
      .withColumn("predicted", langPredicted(col("__ws"), profiles))
      .drop("__ws")
  }

  /** Word-distribution (Shannon) entropy per document — the
    * gibberish/boilerplate quality filter: low entropy flags repeated
    * boilerplate, implausibly high flags random noise.
    *
    * Plan shape: one explode + ONE doc-keyed shuffle — the explicit
    * doc_id repartition satisfies the (doc_id, w) aggregate (clustering
    * on a superset of the partition keys), the per-doc total window,
    * AND the final per-doc aggregate, so nothing downstream reshuffles.
    * Determinism: the float entropy sum is rounded (4dp) like every
    * cross-engine float fold in this suite. */
  def entropy(df: DataFrame, textCol: String = "text"): DataFrame = {
    val wdoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    df.select(col("doc_id"), explode(words(col(textCol))).as("w"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("n", sum("tf").over(wdoc))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_distinct"),
        max("n").as("n_words"),
        round(-sum((col("tf") / col("n")) * log(col("tf") / col("n"))), 4)
          .as("entropy"))
  }

  /** Top-k terms per document by TF-IDF — the classic corpus-relative
    * keyword extractor (smoothed idf, sklearn's convention:
    * `ln((N+1)/(df+1)) + 1`).
    *
    * Plan shape for 100 TB: term frequencies are one hash aggregate on
    * `(doc_id, term)` (map-side combined); document frequencies reuse
    * that aggregate's output (one more agg on `term`, tiny); the corpus
    * size joins in as a broadcast one-row cross join (never an action
    * at build time); ranking is a per-doc window over ≤ |doc's terms|
    * rows. No data is ever collected to the driver.
    *
    * Cross-engine determinism: scores are rounded (4dp) BEFORE ranking
    * so a last-ulp `ln` difference between engines can neither reorder
    * the top-k nor fail the hash compare; rank ties break on the term
    * string. */
  def tfidfTopK(
      df: DataFrame,
      k: Int = 3,
      textCol: String = "text"): DataFrame = {
    val tok = df.select(col("doc_id"), explode(words(col(textCol))).as("term"))
    // ONE token-scale exchange on doc_id alone: partitioning by doc_id
    // clusters every (doc, term) pair of a doc, so the tf aggregate
    // plans no exchange of its own AND the per-doc top-k window below
    // reuses the same partitioning — the (doc,term)-hash + by-term +
    // by-doc exchange chain this replaces moved term-scale rows three
    // times. tf is consumed twice (df aggregate + score join):
    // materialize it once, call-scoped (localCheckpoint preserves the
    // doc_id partitioning for the window).
    val tf = tok.repartition(col("doc_id"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // document frequency is vocabulary-sized — broadcast it back rather
    // than re-shuffling tf by term (at corpora whose vocabulary outgrows
    // the driver, drop the hint and let AQE pick from runtime sizes)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = broadcast(df.agg(count(lit(1)).as("__n")))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(n)
      .withColumn("score",
        round(col("tf") * (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))) + 1), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  /** Repetition-quality signals (the Gopher-style repetition filters
    * every web-corpus pipeline applies before training): per document,
    * the fraction of words taken by the most frequent word and the
    * fraction of duplicated word bigrams. High values flag boilerplate
    * and degenerate repetition that length/stopword heuristics
    * ([[quality]]) miss.
    *
    * Plan shape: one `(doc_id, word)` hash aggregate (map-side
    * combined) for the word stats; bigrams form relationally (the
    * window-`lead` gram builder — same rationale as
    * [[Dedup.shingleIndex]]: stays in whole-stage codegen) and reduce
    * in a second doc-keyed aggregate. Both aggregates and the final
    * join share the doc_id partitioning, so after the first exchange
    * nothing reshuffles; no per-doc state exceeds the doc's own token
    * count. */
  def repetition(df: DataFrame, textCol: String = "text"): DataFrame = {
    // token exchanges on doc_id ONLY: doc_id partitioning satisfies
    // every downstream shape — the (doc, w) aggregate, its per-doc
    // rollup, the bigram window's partitionBy, the bigram aggregate,
    // and the final per-doc join (both sides arrive doc-partitioned, so
    // the join plans no exchange either). Each consumer re-derives the
    // cheap codegen'd tokenize rather than checkpointing a token-scale
    // frame (measured: materializing exploded tokens costs more than
    // the second scan).
    val tok = df.select(
        col("doc_id"), posexplode(words(col(textCol))).as(Seq("pos", "w")))
      .repartition(col("doc_id"))
    val wordAgg = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), max("c").as("top_c"),
        count(lit(1)).as("n_distinct_words"))
    val wLead = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val bigramAgg = tok
      .select(col("doc_id"),
        concat_ws(" ", col("w"), lead("w", 1).over(wLead)).as("bg"),
        lead("w", 1).over(wLead).isNotNull.as("__complete"))
      .where(col("__complete"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), countDistinct("bg").as("n_distinct_bigrams"))
    wordAgg.join(bigramAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_words"), col("n_distinct_words"),
        round(col("top_c").cast("double") / col("n_words"), 4).as("top_word_ratio"),
        when(col("n_bigrams") > 0,
          round(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 4))
          .as("dup_bigram_ratio"))
  }

  /** Per-document negative log-likelihood under the corpus's own
    * add-one-smoothed unigram LM — the CCNet/Wikipedia-LM
    * perplexity-filter shape with the external KenLM swapped for the
    * corpus unigram model (the SQL-expressible stand-in: the operator
    * shape — score every document under a shared language model and
    * filter on the tail — is identical; a real deployment loads learned
    * n-gram tables instead of deriving them).
    *
    * `p(term) = (cf + 1) / (T + V)` over corpus term counts; per doc,
    * `nll = -Σ tf·ln p / n_tokens`, `ppl = e^nll`. Low-probability
    * vocabulary (typos, junk, boilerplate markup) drives `ppl` up —
    * sort descending and cut the tail.
    *
    * Plan shape: ONE token-scale exchange on doc_id (the [[tfidfTopK]]
    * pricing — the (doc, term) aggregate, the model join-back, and the
    * final per-doc aggregate all reuse it); the model itself is
    * vocabulary-sized and broadcasts. Determinism: the ln-sum is
    * rounded (4dp) after the exact-integer division like every
    * cross-engine float fold in this suite; `ppl` exponentiates the
    * *rounded* nll so both engines exponentiate identical bits. */
  def unigramLogProb(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tf = df.select(col("doc_id"), explode(words(col(textCol))).as("term"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // consumed twice: corpus counts + the score join
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val totals = broadcast(cf.agg(sum("cf").as("__t"), count(lit(1)).as("__v")))
    val model = cf.crossJoin(totals)
      .select(col("term"),
        ((col("cf") + 1).cast("double") / (col("__t") + col("__v")).cast("double")).as("p"))
    tf.join(broadcast(model), "term")
      .groupBy("doc_id")
      .agg(
        sum("tf").as("n_tokens"),
        round(-sum(col("tf") * log(col("p"))) / sum("tf"), 4).as("nll"))
      .withColumn("ppl", round(exp(col("nll")), 4))
  }

  /** [[unigramLogProb]]'s bigram extension, CROSS-corpus — the real
    * CCNet shape: the LM trains on `train`, scores `score` (an LM
    * self-trained on the scored corpus can never back off — every
    * in-doc bigram is in its own model). Stupid backoff (Brants et
    * al. 2007, the web-scale convention: no normalization, a missing
    * bigram backs off to α·p_unigram with α = 0.4), add-one unigram
    * smoothing extends naturally to OOV terms (cf = 0):
    *
    *   s(w₀)        = p_uni(w₀) = (cf+1)/(T+V)
    *   s(wᵢ|wᵢ₋₁)   = cf₂(wᵢ₋₁,wᵢ)/cf(wᵢ₋₁)   when the bigram was seen
    *                  0.4 · p_uni(wᵢ)          otherwise
    *
    * (cf(prev) counts ALL train occurrences of prev, including
    * doc-final ones — the unnormalized stupid-backoff convention,
    * identical on both engines.)
    *
    * Plan shape: ONE token-scale exchange per corpus on doc_id
    * (window-lag bigram builder; the score side's final per-doc
    * aggregate reuses its own); the unigram and bigram tables
    * broadcast back (vocabulary/bigram-vocabulary sized — at corpora
    * where the bigram table outgrows the driver, drop the hint and AQE
    * picks from runtime sizes). */
  def bigramLogProb(
      score: DataFrame,
      train: DataFrame,
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    def bigrams(df: DataFrame) =
      df.select(col("doc_id"), posexplode(words(col(textCol))).as(Seq("pos", "term")))
        .repartition(col("doc_id"))
        .withColumn("prev", lag("term", 1).over(w))
    val trainBig = bigrams(train).localCheckpoint() // consumed twice: cf + cf2
    val cf = trainBig.groupBy("term").agg(count(lit(1)).as("cf"))
    val tot = broadcast(cf.agg(sum("cf").as("__t"), count(lit(1)).as("__v")))
    val cf2 = trainBig.where(col("prev").isNotNull)
      .groupBy(col("prev"), col("term")).agg(count(lit(1)).as("cf2"))
    val prevCf = cf.select(col("term").as("prev"), col("cf").as("cf_prev"))
    bigrams(score)
      .join(broadcast(cf), Seq("term"), "left") // OOV terms keep cf null
      .join(broadcast(prevCf), Seq("prev"), "left")
      .join(broadcast(cf2), Seq("prev", "term"), "left")
      .crossJoin(tot)
      .withColumn("__pu",
        (coalesce(col("cf"), lit(0L)) + 1).cast("double") /
          (col("__t") + col("__v")).cast("double"))
      .withColumn("__s",
        when(col("prev").isNull, col("__pu"))
          .when(col("cf2").isNotNull,
            col("cf2").cast("double") / col("cf_prev").cast("double"))
          .otherwise(lit(0.4) * col("__pu")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-sum(log(col("__s"))) / count(lit(1)), 4).as("nll"))
      .withColumn("ppl", round(exp(col("nll")), 4))
  }

  /** Per-source corpus rollup — the per-domain accounting view a
    * training-data pipeline keeps (docs, exact-dup rate via distinct
    * content hash, size, language spread). One hash aggregate keyed by
    * `source`: map-side combined, |sources| output rows, no second
    * shuffle. `avg_chars` divides the exact long sum by the exact
    * count, so both engines divide identical bits. */
  def sourceStats(df: DataFrame): DataFrame =
    df.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique"),
      sum("n_chars").as("sum_chars"),
      round(sum("n_chars").cast("double") / count(lit(1)), 2).as("avg_chars"),
      countDistinct("lang").as("n_langs"))

  /** Deterministic hash-Bernoulli sampling with per-source rates — the
    * data-mixing primitive: a training run that wants 80% of source A
    * and 25% of everything else keeps a row iff its content-stable hash
    * falls under the stratum's rate. Zero shuffles, zero coordination:
    * the decision is a per-row codegen'd expression, so the "sample" is
    * reproducible across runs, engines, AND corpus growth (a doc's
    * in/out never changes as neighbors arrive — the property reservoir
    * or fraction-of-count sampling cannot give at 100 TB).
    *
    * The hash is salted (`"mix:"`) so the sample is independent of any
    * other hash-ordered decision on the same ids. `rates` is applied as
    * a literal CASE chain; sources absent from it fall to
    * `defaultRate`. */
  def weightedSample(
      df: DataFrame,
      rates: Seq[(String, Double)],
      defaultRate: Double): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate)) { case ((src, p), els) =>
      when(col("source") === src, lit(p)).otherwise(els)
    }
    df.select(
      col("doc_id"), col("source"),
      (wordHash(concat(lit("mix:"), col("doc_id").cast("string"))) % 10000)
        .as("sample_hash"))
      .where(col("sample_hash") < rate * 10000)
  }

  /** Rolling polynomial fingerprint over word hashes:
    * `fp = fold(0, (acc, h) => (acc * 31 + h) mod 1e9+7)` — an
    * order-sensitive document signature (content-defined chunking /
    * incremental dedup building block). */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val hashes = transform(words(col(textCol)), wordHash(_))
    df.select(
      col("doc_id"),
      aggregate(hashes, lit(0L), (acc, h) => (acc * 31 + h) % 1000000007L)
        .as("fingerprint"))
  }
}
