package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step every
  * LLM pipeline runs before training: find training documents that
  * share long n-grams with an evaluation/benchmark corpus, so they
  * can be dropped (a contaminated train set inflates eval scores).
  * The overlap is an equi-join on hashed n-gram content (the same
  * 60-bit at-source hashing as the dedup pipelines — 8-byte longs
  * through the shuffle), never a document cross-join; the eval side
  * is typically tiny and broadcastable, but the dataflow stays
  * shuffle-keyed so a large held-out corpus works identically.
  */
object Decontam {

  /** Training docs sharing ≥ 1 hashed word n-gram with the eval gram
    * SET (per-doc grams are distinct, the eval side is reduced to
    * distinct grams before the join — so the join emits at most one
    * row per (train doc, gram) and n_shared is a plain count, no
    * countDistinct expand, no per-eval-doc row multiplication). A
    * benchmark's gram set is small → Spark broadcasts it and the
    * train side never shuffles; a huge held-out corpus degrades
    * gracefully to the same gram-keyed equi-join. `excludeIds` drops
    * eval docs themselves when both sides come from one corpus.
    * Returns (id, n_shared).
    */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String,
              textCol: String, n: Int = 8,
              excludeEvalIds: Boolean = true): DataFrame = {
    val tsh = Dedup.shingles(train, idCol, textCol, n)
    val evalIds = eval.select(col(idCol).as("id")).distinct()
    val esh = Dedup.shingles(eval, idCol, textCol, n)
      .select(col("sh")).distinct()
    val t = if (excludeEvalIds) tsh.join(evalIds, Seq("id"), "left_anti")
            else tsh
    t.join(esh, Seq("sh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
