package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `rand()`-based sampling is partitioning-dependent (re-seeds per
  * partition, so a repartition or executor change reshuffles the
  * sample). These operators hash a stable key instead: the sample is
  * a pure row-local predicate — reproducible under any partitioning,
  * evaluated inside the scan stage (no shuffle, no join; the md5 is
  * computed per row so it is not a parquet PushedFilter), joinable
  * across tables (the same id lands in the same split everywhere), and
  * engine-independent (md5-derived integer arithmetic,
  * DuckDB-checkable).
  */
object Sampling {

  /** md5-derived 60-bit uniform hash of (seed, key) — the codegen'd
    * [[graft.functions.Md5Prefix60]] kernel, bit-identical to the
    * conv(substring(md5(...),1,15),16,10) SQL the oracles replay.
    */
  def hash60(key: Column, seed: Long): Column =
    graft.functions.Md5Prefix60.md5_prefix60(
      concat(lit(seed.toString), lit(":"), key.cast("string")))

  /** Keep rows whose hash falls below fraction · 2^60 — a seed-stable
    * Bernoulli(fraction) sample.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val threshold = (fraction * (1L << 60).toDouble).toLong
    df.filter(hash60(col(keyCol), seed) < lit(threshold))
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * hash60(key) mod k — scan-local (no shuffle, no global order),
    * seed-stable, partitioning-independent, and join-stable (the same
    * key lands in the same fold in every table), so fold i's
    * train/test pair is reproducible on any cluster layout. Folds are
    * uniform to the hash's 60-bit resolution, not exactly equal-sized
    * (the standard trade for a stateless assignment at 100 TB).
    */
  def kfold(df: DataFrame, keyCol: String, k: Int,
            seed: Long = 42L): DataFrame = {
    require(k > 1, s"k-fold needs k > 1, got $k")
    df.withColumn("fold",
      pmod(hash60(col(keyCol), seed), lit(k.toLong)).cast("int"))
  }

  /** Per-stratum Bernoulli rates — the corpus-rebalancing op (e.g.
    * downsample the dominant language): rows in stratum s survive with
    * probability fractions(s); strata not listed are dropped. Same
    * row-local hash predicate as [[hashSample]], so it stays
    * deterministic, partitioning-independent, and scan-stage-fused.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           fractions: Map[String, Double],
                           seed: Long = 42L): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val thr = fractions.foldLeft(lit(-1L)) { case (acc, (s, f)) =>
      when(col(stratumCol) === lit(s),
        lit((f * (1L << 60).toDouble).toLong)).otherwise(acc)
    }
    df.filter(hash60(col(keyCol), seed) < thr)
  }

  /** Assign each row a named split by hash range: weights are
    * normalized, cumulative thresholds partition [0, 2^60). The same
    * (seed, key) always lands in the same split — across tables, runs,
    * and cluster layouts.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)],
                seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c / total * (1L << 60).toDouble).toLong)
    val h = hash60(col(keyCol), seed)
    val labeled = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), cum), elseCol) =>
      when(h < lit(cum), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", labeled)
  }

  /** Token-budget mixture sampling — the "data mixture" op of a
    * training-corpus build: per stratum (language/domain), keep
    * documents in deterministic hash order until the stratum's token
    * budget fills; strata not listed are dropped. The cumulative sum
    * is a window partitioned BY STRATUM (parallel across strata; a
    * stratum's scan is one ordered pass, the same shape as any
    * running total). Hash order makes the kept set a uniform random
    * subsample that is stable under repartitioning AND incremental
    * growth: a document's (seed, id) hash never changes, so re-running
    * on a grown corpus keeps a superset-consistent prefix.
    * Returns the kept rows + (n_tokens, cum_tokens).
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, stratumCol: String,
                        tokenCount: Column, budgets: Map[String, Long],
                        seed: Long = 42L): DataFrame = {
    require(budgets.values.forall(_ > 0))
    val budget = budgets.foldLeft(lit(-1L)) { case (acc, (s, b)) =>
      when(col(stratumCol) === lit(s), lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hash60(col(keyCol), seed), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("n_tokens", tokenCount)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Sequence packing — the step that turns a cleaned corpus into
    * fixed-token-budget training bins (T5/"packing" style: documents
    * concatenate in a deterministic order; a new bin opens every
    * maxTokens tokens, the boundary document spilling into the next
    * bin to be split at tokenization time). Documents are first
    * hash-bucketed (`numBuckets` independent packing streams) so the
    * running total is a window PARTITIONED BY BUCKET — fully parallel,
    * no global sort; within a bucket the order is the stable (hash,
    * key) order, so the packing is deterministic under any
    * partitioning and incremental growth. bin = prev_cum div
    * maxTokens; bin_offset = where the document starts inside its bin.
    * Returns the input + (bucket, n_tokens, bin, bin_offset).
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCount: Column,
                    maxTokens: Long, numBuckets: Int = 64,
                    seed: Long = 42L): DataFrame = {
    require(maxTokens > 0 && numBuckets > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("_h"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_h", hash60(col(keyCol), seed))
      .withColumn("bucket", pmod(col("_h"), lit(numBuckets.toLong)).cast("int"))
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("_prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", ((col("_prev") - col("_prev") % lit(maxTokens))
        / lit(maxTokens)).cast("long"))
      .withColumn("bin_offset", col("_prev") % lit(maxTokens))
      .drop("_h", "_prev")
  }
}
