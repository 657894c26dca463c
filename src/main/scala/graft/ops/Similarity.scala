package graft.ops

import graft.functions.VecDot.vec_dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the
  * (small) query set against the corpus, ranked per query. At 100 TB
  * the corpus side stays partitioned; only queries broadcast, so the
  * scan is embarrassingly parallel and the per-query top-k is a
  * window over each query's partition slice.
  *
  * Scale path: sign-random-projection LSH — 'numPlanes' deterministic
  * integer hyperplanes hash every vector into a bucket; candidate
  * generation is an equi-join on the bucket id (shuffle keyed on
  * content, never all-pairs). An IVF variant would swap the plane
  * hash for a learned coarse quantizer; the bucketing dataflow is
  * identical.
  */
object Similarity {

  /** Deterministic integer hyperplane component: plane b, dim j
    * (same values the DuckDB oracle computes inline).
    */
  def planeComponent(b: Int, j: Int): Double =
    ((b * 37 + j * 101) % 19 - 9).toDouble

  /** Bucket id from sign bits of `numPlanes` integer hyperplanes.
    * Planes are literal double arrays → each dot is one codegen'd
    * VecDot pass over the vector.
    */
  def lshBucket(vec: Column, dims: Int, numPlanes: Int): Column = {
    val dots = (0 until numPlanes).map { b =>
      val plane = array((0 until dims).map(j => lit(planeComponent(b, j))): _*)
      vec_dot(vec, plane)
    }
    dots.zipWithIndex.map { case (d, b) =>
      when(d > 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Brute-force cosine top-k: (qid, rank, vec_id, cos) for each
    * query row, deterministic (cos desc, vec_id) ranking.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("qn")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
        sqrt(vec_dot(col(vecCol), col(vecCol))).as("cn"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  /** LSH-bucketed top-k: rank only within the query's bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dims: Int, numPlanes: Int, k: Int): DataFrame = {
    val bucket = lshBucket(col(vecCol), dims, numPlanes)
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("cn"), bucket.as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("qn"), bucket.as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("bucket"), col("vec_id"),
        (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("bucket"), col("rank"), col("vec_id"), col("cos"))
  }
}
