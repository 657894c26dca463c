package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring — the CCNet-style
  * quality filter: score every document by its average bigram
  * log-probability under a model fitted on the corpus itself, then
  * drop the tail (web text that no fluent model explains). The model
  * IS two aggregation tables — bigram and unigram counts, shuffled on
  * gram content with map-side combine — and scoring is two equi-joins
  * of the doc's bigrams against them: exactly the dataflow that holds
  * when the "model" is billions of grams across executors, where a
  * driver-side dictionary would die.
  */
object LangModel {

  /** Add-one-smoothed bigram MLE score per document:
    * score(d) = (1/|bg(d)|) · Σ ln((c(w1,w2) + 1) / (c(w1) + V)).
    * Returns (id, n_bg, lm_score) — higher = more fluent under the
    * corpus model. Raw-string grams (cheap CPU; the joins dominate).
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // index-first explode, gram built codegen'd after (Dedup.shingles
    // has the why); w1 comes straight off the token array — no
    // re-split of the gram at join time
    val docBg = docs.select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"), col("toks"),
        explode(when(size(col("toks")) >= 2,
            sequence(lit(1), size(col("toks")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"), element_at(col("toks"), col("i")).as("w1"),
        concat_ws(" ", element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + lit(1))).as("bg"))
    val tok = docs.select(explode(toks).as("tok"))
    val c2 = docBg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = tok.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
      .select(col("tok").as("w1"), col("c1"))
    val v = tok.agg(countDistinct(col("tok")).as("v"))
    docBg
      .join(c2, Seq("bg"))
      .join(c1, Seq("w1"))
      .withColumn("v", v.scalar())
      .select(col("id"),
        log((col("c2").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("v").cast("double"))).as("lp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bg"),
        round(sum(col("lp")) / count(lit(1)).cast("double"), 6).as("lm_score"))
  }
}
