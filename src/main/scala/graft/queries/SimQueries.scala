package graft.queries

import graft.core.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search operators over `embeddings` as oracle-checked
  * queries: brute-force cosine top-k (baseline) and sign-random-
  * projection LSH bucketing (scale path). Dot products are computed
  * in identical sequential order on both engines so rank cutoffs
  * agree bit-exactly; only displayed cosines are rounded.
  */
object SimQueries {

  private val Dims = 64
  private val Planes = 4
  private val TopK = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", TopK)
        .select(col("qid"), col("rank"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),

    "q_sim_lsh_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", Dims, Planes, 3)
        .select(col("qid"), col("bucket"), col("rank"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),

    "q_sim_buckets" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      emb.select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), Dims, Planes).as("bucket"))
        .orderBy("vec_id")
    }))

  /** dot in fixed sequential order; mirrors Dedup.cosine exactly. */
  private val dotSql =
    "list_reduce(list_transform(list_zip(%s, %s), z -> z[1] * z[2]), (p, q) -> p + q)"

  private val bucketSql: String = {
    val dots = (0 until Planes).map { b =>
      val dot = s"""list_reduce(list_transform(generate_series(0, ${Dims - 1}),
                   |  j -> x[j + 1] * CAST(($b * 37 + j * 101) % 19 - 9 AS DOUBLE)),
                   |  (p, q) -> p + q)""".stripMargin.replaceAll("\n", " ")
      s"CASE WHEN $dot > CAST(0 AS DOUBLE) THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    dots.mkString(" + ")
  }

  val oracles: Map[String, String] = Map(
    "q_sim_topk" -> {
      val dot = dotSql.format("q.x", "c.x")
      val nq = dotSql.format("q.x", "q.x")
      val nc = dotSql.format("c.x", "c.x")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |sc AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |              $dot / (sqrt($nq) * sqrt($nc)) AS cos
         |       FROM v q JOIN v c ON c.vec_id != q.vec_id
         |       WHERE q.vec_id < 5),
         |rk AS (SELECT qid, vec_id, cos,
         |              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |       FROM sc)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
         |FROM rk WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
    },

    "q_sim_lsh_topk" -> {
      val dot = dotSql.format("q.x", "c.x")
      val nq = dotSql.format("q.x", "q.x")
      val nc = dotSql.format("c.x", "c.x")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |bk AS (SELECT vec_id, x, $bucketSql AS bucket FROM v),
         |sc AS (SELECT q.vec_id AS qid, q.bucket AS bucket, c.vec_id AS vec_id,
         |              $dot / (sqrt($nq) * sqrt($nc)) AS cos
         |       FROM bk q JOIN bk c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
         |       WHERE q.vec_id < 10),
         |rk AS (SELECT qid, bucket, vec_id, cos,
         |              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |       FROM sc)
         |SELECT qid, bucket, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
         |FROM rk WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    },

    "q_sim_buckets" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)
         |SELECT vec_id, $bucketSql AS bucket FROM v ORDER BY vec_id""".stripMargin)
}
