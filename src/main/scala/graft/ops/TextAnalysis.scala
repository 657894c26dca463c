package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting (whitespace + BPE-ish regex), quality scoring
  * (length / punctuation / stopword ratios), n-gram-heuristic
  * language ID, and document fingerprinting. All pure codegen'd
  * column expressions — they fuse into the parquet scan stage, no
  * UDFs, no shuffles; per-document cost is O(len).
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation marks.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Language marker stopwords (classic n-gram/stopword heuristic).
    * Deterministic scoring; argmax with alphabetical priority.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  def langScore(text: Column, lang: String): Column = {
    val m = markers.toMap.apply(lang)
    size(filter(tokens(text), t =>
      array_contains(array(m.map(lit(_)): _*), t)))
  }

  /** Argmax over marker scores, ties resolved alphabetically. */
  def predictedLang(text: Column): Column = {
    val langs = markers.map(_._1) // alphabetical already
    val scores = langs.map(l => l -> langScore(text, l)).toMap
    langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), elseCol) =>
        val laterLangs = langs.drop(i + 1)
        val cond = laterLangs.map(o => scores(l) >= scores(o))
          .reduce(_ && _)
        when(cond, lit(l)).otherwise(elseCol)
    }
  }

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", "")))
      .cast("double") / length(text).cast("double")

  def stopwordRatio(text: Column): Column =
    langScore(text, "en").cast("double") / tokenCount(text).cast("double")

  /** Mean token length for single-space-joined text. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text).cast("double")

  /** round(x, 6) with EXPLICIT half-up ties, identical across
    * engines: ratio-valued signals (integer counts / integer counts)
    * can land exactly on a 7-decimal half (sf0.1 produced
    * 333/640 = 0.5203125), where Spark's round (decimal HALF_UP) and
    * DuckDB's round on DOUBLE (half-even) disagree. floor(x*1e6+0.5)
    * is plain IEEE mul/add/floor, bit-identical in both engines; use
    * it for every RATIONAL rounded output (exp/log outputs keep
    * native round — their ties have measure zero).
    */
  def round6HalfUp(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Bounded heuristic quality score: rewards stopword density and
    * word lengths in a natural range, penalizes punctuation noise.
    */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) * lit(2.0) +
      least(avgTokenLen(text) / lit(10.0), lit(1.0)) -
      punctRatio(text)

  /** Normalized-content MD5 fingerprint (lowercase, collapsed
    * whitespace) — the exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Hashed word n-gram array (60-bit md5-prefix ints, same hashing
    * as [[Dedup.shingleInt]]) — grams move through shuffles as 8-byte
    * longs, not strings.
    */
  def ngramHashes(toks: Column, n: Int): Column = {
    val idx = when(size(toks) >= n, sequence(lit(1), size(toks) - lit(n - 1)))
      .otherwise(array().cast("array<int>"))
    transform(idx, i => Dedup.shingleInt(
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
  }

  /** Hashing-trick featurization (Weinberger et al. '09 — the
    * fixed-width bag-of-words every large-scale linear/quality
    * classifier trains on): token → bucket via the md5-derived
    * shingle hash mod numFeatures; per (doc, bucket) counts in LONG
    * form (id, bucket, cnt). One shuffle keyed on (id, bucket),
    * map-side combined; no vocabulary fit, no broadcast dictionary —
    * the property that makes the trick work at corpus scale.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     numFeatures: Int): DataFrame = {
    require(numFeatures > 0)
    docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .select(col("id"),
        pmod(Dedup.shingleInt(col("tok")), lit(numFeatures.toLong))
          .cast("int").as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Raw-string word n-gram array — for per-row distinct counts and
    * small per-doc modes, where building md5 ints ([[ngramHashes]])
    * would cost more CPU than the few extra bytes save.
    */
  def ngramStrings(toks: Column, n: Int): Column = {
    val idx = when(size(toks) >= n, sequence(lit(1), size(toks) - lit(n - 1)))
      .otherwise(array().cast("array<int>"))
    transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    * duplicate-token fraction, most-frequent-bigram fraction, and
    * duplicate-trigram fraction per document. Distinct counts are
    * scan-fused per-row array expressions (no shuffle); gram COUNTS
    * are plain token arithmetic (no gram materialization at all);
    * only the bigram MODE needs a groupBy — keyed on (id, gram),
    * map-side combined, linear in corpus size — and the join back
    * carries scalars only, never the gram arrays. Documents scoring
    * high on any signal are boilerplate/spam candidates a
    * training-data pipeline drops. Returns (id, n_tokens,
    * uniq_tokens, dup_tok_frac, top_bigram_cnt, top_bigram_frac,
    * dup_trigram_frac).
    */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{size => asize}
    val base = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"),
        asize(col("toks")).as("n_tokens"),
        asize(array_distinct(col("toks"))).as("uniq_tokens"),
        asize(array_distinct(ngramStrings(col("toks"), 3))).as("uniq_tg"))
      .select(col("id"), col("n_tokens"), col("uniq_tokens"),
        when(col("n_tokens") >= 2, col("n_tokens") - 1).otherwise(0).as("n_bg"),
        when(col("n_tokens") >= 3, col("n_tokens") - 2).otherwise(0).as("n_tg"),
        col("uniq_tg"))
    // bigram mode: explode the cheap index sequence, build the gram
    // AFTER the explode (codegen'd, evaluated once — a gram array
    // under explode pays the interpreted-lambda + inferred-filter
    // triple evaluation, see Dedup.shingles)
    val topBg = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"),
        explode(when(asize(col("toks")) >= 2,
            sequence(lit(1), asize(col("toks")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"), concat_ws(" ", element_at(col("toks"), col("i")),
        element_at(col("toks"), col("i") + lit(1))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(max(col("c")).as("top_bigram_cnt"))
    // LEFT join + guarded fractions: docs with < 2 tokens have no
    // bigram rows — an inner join would silently drop exactly the
    // degenerate/spam candidates a repetition gate exists to see.
    // Zero denominators (empty/1-token/2-token docs) report 0.0.
    base.join(topBg, Seq("id"), "left")
      .withColumn("top_bigram_cnt", coalesce(col("top_bigram_cnt"), lit(0L)))
      .select(col("id"), col("n_tokens"), col("uniq_tokens"),
        when(col("n_tokens") > 0,
          round6HalfUp((col("n_tokens") - col("uniq_tokens")).cast("double") /
            col("n_tokens").cast("double"))).otherwise(lit(0.0))
          .as("dup_tok_frac"),
        col("top_bigram_cnt"),
        when(col("n_bg") > 0,
          round6HalfUp(col("top_bigram_cnt").cast("double") /
            col("n_bg").cast("double"))).otherwise(lit(0.0))
          .as("top_bigram_frac"),
        when(col("n_tg") > 0,
          round6HalfUp((col("n_tg") - col("uniq_tg")).cast("double") /
            col("n_tg").cast("double"))).otherwise(lit(0.0))
          .as("dup_trigram_frac"))
  }

  /** Sliding token-window document chunks — the standard context-
    * window prep for training/embedding pipelines. Chunks of `size`
    * tokens every `stride` tokens (stride < size ⇒ overlap); the last
    * chunk may be short; a doc shorter than `size` yields one chunk.
    * Pure per-row array expressions fused into the scan — the chunk
    * explosion is bounded by ~len/stride per doc, no shuffle, no UDF.
    * Returns (id, chunk_idx, chunk_text, n_tokens).
    */
  def chunkTokens(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    val toks = tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(toks)
    // number of window starts 0, stride, 2·stride… covering all tokens
    val nStarts = when(n <= size, lit(1))
      .otherwise(floor((n - size + stride - 1) / lit(stride)).cast("int") + lit(1))
    docs.select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), nStarts - 1), s =>
          slice(toks, s * stride + 1, lit(size)))).as(Seq("chunk_idx", "chunk")))
      .select(col("id"), col("chunk_idx"),
        array_join(col("chunk"), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(col("chunk")).as("n_tokens"))
  }
}
