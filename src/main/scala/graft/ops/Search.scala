package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document corpus: Okapi BM25 scoring of a
  * fixed term set, built from the same inverted-index dataflow a
  * search engine materializes — per-(doc, term) frequencies (one
  * map-side-combined groupBy keyed on content), a tiny per-term
  * document-frequency table (broadcast), and per-doc lengths from the
  * scan. Top-k goes through orderBy().limit(k) (TakeOrderedAndProject
  * — per-partition heaps + a k-row driver merge, never a global
  * sort), and the rank column is a window over the k surviving rows
  * only. Ranking compares ROUNDED scores (ln differs in ulps across
  * engines; round-then-rank keeps the cutoff engine-independent).
  */
object Search {

  /** BM25 top-k: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b
    * + b·|d|/avgdl)), idf = ln((N − df + ½)/(df + ½) + 1) — the
    * Robertson et al. TREC-3 formulation with the +1 idf floor used
    * by Lucene. Returns (id, score, rnk), rnk 1..k by (score desc,
    * id).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               k: Int = 20): DataFrame = {
    val lens = docs.select(col(idCol).as("id"),
      TextAnalysis.tokenCount(col(textCol)).as("dl"))
    // 1-row corpus stats attach as ONE struct-valued scalar subquery
    // (multi-column scalar; no join)
    val stats = docs.agg(struct(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("sum_dl"))
      .as("_st"))
    val tf = docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
    val norm = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / avgdl)
    val scored = tf
      .join(broadcast(dfT), Seq("tok"))
      .join(lens, Seq("id"))
      .withColumn("_st", stats.scalar())
      .withColumn("n_docs", col("_st.n_docs"))
      .withColumn("sum_dl", col("_st.sum_dl"))
      .select(col("id"), (idf * (tfD * lit(k1 + 1.0) / norm)).as("s"))
    val top = scored.groupBy(col("id"))
      .agg(round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
    // BOUNDED global window: `top` is post-limit (<= k rows), so the
    // single partition is by construction, not a scale hazard. The
    // constant key must be NON-FOLDABLE (id*0, not lit(0)) — Catalyst
    // folds a literal out of the partition spec, which both re-opens
    // the WindowExec "no partition defined" warning and hides the
    // documented boundedness from the plan.
    top.withColumn("rnk",
        row_number().over(Window.partitionBy(col("id") * 0)
          .orderBy(col("score").desc, col("id"))))
      .orderBy("rnk")
  }

  /** Materialized inverted index: term → document frequency + the
    * sorted posting list (as a join-delimited string, the
    * engine-neutral hashable form). ONE shuffle keyed on the term
    * after a per-row distinct explode; posting lists aggregate
    * map-side. `maxDf` drops stop-terms whose posting lists carry no
    * retrieval signal but dominate the shuffle at corpus scale — the
    * same Zipf guard as Dedup.ngramJaccardPairs' shingle cap (a
    * 100-TB corpus has terms with billion-row postings; capped terms
    * keep the per-key payload bounded).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L,
                    maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    // the maxDf cap must land BEFORE the posting aggregation: a
    // billion-document stop term would otherwise funnel its full
    // posting list through one reducer's collect_list buffer and only
    // THEN be discarded — the cheap df pre-pass (a count on the same
    // shuffle key) drops those keys from the heavy aggregate entirely
    val src =
      if (maxDf == Long.MaxValue) pairs
      else {
        val p2 = graft.core.Pins.pin(pairs)
        val keep = p2.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf)
        p2.join(keep.select(col("term")), Seq("term"))
      }
    src.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("id"))), ",").as("postings"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
  }

  /** Hybrid retrieval: fuse the BM25 lexical leg with a cosine
    * vector leg by reciprocal-rank fusion (RRF, Cormack et al.
    * SIGIR'09): rrf(d) = Σ_legs 1/(kRrf + rank_leg(d)); a document
    * absent from a leg contributes nothing for it. Both legs rank
    * ROUNDED scores with an id tiebreak (engine-stable cutoffs, the
    * [[bm25TopK]] convention), so the integer ranks — and therefore
    * the fused scores — are exactly reproducible.
    *
    * Scale shape: the vector leg is a broadcast 1-row query vector
    * against the embedding scan (top-legK via TakeOrderedAndProject —
    * per-partition heaps, no global sort), the lexical leg is
    * [[bm25TopK]]'s keyed aggregations; everything downstream of the
    * legs operates on their bounded top-legK lists (≤ 2·legK rows),
    * so fusion cost is independent of corpus size. Returns
    * (rank, id, rrf).
    */
  def hybridTopK(docs: DataFrame, docIdCol: String, textCol: String,
                 terms: Seq[String],
                 emb: DataFrame, vecIdCol: String, vecCol: String,
                 queryVecId: Long, legK: Int = 20, kRrf: Int = 60,
                 k: Int = 10): DataFrame = {
    import graft.functions.VecDot.vec_dot
    val lex = bm25TopK(docs, docIdCol, textCol, terms, k = legK)
      .select(col("id"), col("rnk").as("r"))
    val qv = broadcast(emb.filter(col(vecIdCol) === queryVecId)
      .select(col(vecCol).as("qv")))
    val vtop = emb.filter(col(vecIdCol) =!= queryVecId)
      .crossJoin(qv)
      .select(col(vecIdCol).as("id"),
        round(vec_dot(col(vecCol), col("qv"))
          / (sqrt(vec_dot(col(vecCol), col(vecCol)))
            * sqrt(vec_dot(col("qv"), col("qv")))), 6).as("vcos"))
      .orderBy(col("vcos").desc, col("id")).limit(legK)
    // bounded post-limit windows, as in bm25TopK (non-foldable
    // constant key — see there)
    val vec = vtop.withColumn("r",
        row_number().over(Window.partitionBy(col("id") * 0)
          .orderBy(col("vcos").desc, col("id"))))
      .select(col("id"), col("r"))
    (lex unionByName vec)
      .groupBy(col("id"))
      .agg(round(sum(lit(1.0) / (lit(kRrf.toDouble) + col("r").cast("double"))), 6)
        .as("rrf"))
      .orderBy(col("rrf").desc, col("id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("id") * 0)
          .orderBy(col("rrf").desc, col("id"))))
      .select(col("rank"), col("id"), col("rrf"))
  }
}
