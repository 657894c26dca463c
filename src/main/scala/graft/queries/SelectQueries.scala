package graft.queries

import graft.core.Tables
import graft.ops.{Dsir, LangModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-selection surface: DSIR importance resampling against a
  * target domain (`ops/Dsir.scala`) and CCNet-style perplexity
  * bucketing (head/middle/tail tertiles of the corpus LM score) — the
  * two published recipes for choosing WHICH cleaned documents actually
  * enter a training mix.
  */
object SelectQueries {

  private val DsirBuckets = 2048
  private val DsirK = 100

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DSIR: raw = all documents, target = the English slice;
    // deterministic resample keeps the top-100 by importance weight
    "q_dsir_select" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dsir.select(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", DsirBuckets, DsirK)
        .orderBy("id")
    }),

    // DSIR's published SAMPLED flavor: Gumbel-top-k with seed-stable
    // hash noise — sampling ∝ w without replacement, reproducible and
    // oracle-replayable (round-then-rank keys)
    "q_dsir_gumbel" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dsir.selectGumbel(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", DsirBuckets, DsirK, seed = 29L)
        .orderBy("id")
    }),

    // CCNet head/middle/tail perplexity buckets: tertile thresholds of
    // the corpus-fitted bigram LM score (exact percentile — shared
    // p·(n−1) interpolation), one 1-row broadcast, scan-local CASE
    "q_text_lm_buckets" -> ((s, dir) => {
      // pinned: the scan-fused bigram scoring feeds THREE passes — the
      // percentile aggregate, the final sort's RangePartitioner sample,
      // and the shuffle itself (see Pins.sortedOnce); unpinned it
      // tokenizes and scores the corpus three times per run
      val lm = graft.core.Pins.pin(LangModel.bigramScore(
        Tables.load(s, dir, "documents"), "doc_id", "text"))
      val th = lm.agg(expr("percentile(lm_score, 0.33)").as("p33"),
        expr("percentile(lm_score, 0.66)").as("p66"))
      lm.crossJoin(broadcast(th))
        .select(col("id"), col("n_bg"), col("lm_score"),
          when(col("lm_score") >= col("p66"), lit("head"))
            .when(col("lm_score") >= col("p33"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .orderBy("id")
    }))

  private val bucketSql =
    s"CAST(('0x' || substr(md5(tok), 1, 15))::BIGINT % $DsirBuckets AS INT)"

  // shared DSIR importance-weight derivation (hashed n-gram buckets ->
  // add-1-smoothed log-ratio lambda -> per-doc DECIMAL-exact log_w) --
  // both selection oracles rank over the SAME weights, factored so the
  // smoothing/accumulation arithmetic cannot drift between them
  private val dsirWeightsSql =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |             FROM documents),
       |f AS (SELECT doc_id AS id, $bucketSql AS bucket, count(*) AS cnt
       |      FROM tok GROUP BY 1, 2),
       |rc AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cr FROM f GROUP BY 1),
       |tt AS (SELECT $bucketSql AS bucket FROM
       |         (SELECT unnest(string_split(text, ' ')) AS tok
       |          FROM documents WHERE lang = 'en')),
       |tc AS (SELECT bucket, count(*) AS ct FROM tt GROUP BY 1),
       |nr AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM rc),
       |nt AS (SELECT count(*) AS nt FROM tt),
       |lam AS (SELECT rc.bucket,
       |          CAST(round(ln(
       |            (CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE)
       |             * CAST(nr.nr + $DsirBuckets AS DOUBLE))
       |            / (CAST(rc.cr + 1 AS DOUBLE)
       |               * CAST(nt.nt + $DsirBuckets AS DOUBLE))), 9)
       |            AS DECIMAL(20,9)) AS lam
       |        FROM rc LEFT JOIN tc USING (bucket)
       |        CROSS JOIN nr CROSS JOIN nt),
       |w AS (SELECT f.id, CAST(sum(f.cnt) AS BIGINT) AS n_feat,
       |        CAST(round(sum(CAST(CAST(f.cnt AS DECIMAL(9,0)) * lam.lam
       |                            AS DECIMAL(38,12))), 6)
       |             AS DOUBLE) AS log_w
       |      FROM f JOIN lam USING (bucket) GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q_dsir_select" ->
      (dsirWeightsSql + s""",
         |top AS (SELECT id FROM w ORDER BY log_w DESC, id LIMIT $DsirK)
         |SELECT w.id, w.n_feat, w.log_w,
         |       CASE WHEN top.id IS NULL THEN 0 ELSE 1 END AS sel
         |FROM w LEFT JOIN top USING (id) ORDER BY id""".stripMargin),

    "q_dsir_gumbel" ->
      (dsirWeightsSql + s""",
         |g AS (SELECT id, n_feat, log_w,
         |        round(log_w + -ln(-ln(
         |          (CAST(('0x' || substr(md5('29:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
         |                AS DOUBLE) + 0.5) / ${Dsir.GumbelDen})), 6) AS gkey
         |      FROM w),
         |top AS (SELECT id FROM g ORDER BY gkey DESC, id LIMIT $DsirK)
         |SELECT g.id, g.n_feat, g.log_w, g.gkey,
         |       CASE WHEN top.id IS NULL THEN 0 ELSE 1 END AS sel
         |FROM g LEFT JOIN top USING (id) ORDER BY id""".stripMargin),

    "q_text_lm_buckets" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |bg AS (SELECT doc_id AS id,
        |         unnest(list_transform(
        |           generate_series(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' '
        |                || string_split(text, ' ')[i+1])) AS bg
        |       FROM documents),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
        |c1 AS (SELECT tok, count(*) AS c1 FROM tok GROUP BY tok),
        |v AS (SELECT count(DISTINCT tok) AS v FROM tok),
        |lm AS (SELECT id, count(*) AS n_bg,
        |         round(sum(ln((CAST(c2 AS DOUBLE) + 1.0)
        |                      / (CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE))))
        |               / CAST(count(*) AS DOUBLE), 6) AS lm_score
        |       FROM bg JOIN c2 USING (bg)
        |       JOIN c1 ON string_split(bg.bg, ' ')[1] = c1.tok
        |       CROSS JOIN v
        |       GROUP BY id),
        |th AS (SELECT quantile_cont(lm_score, 0.33) AS p33,
        |              quantile_cont(lm_score, 0.66) AS p66 FROM lm)
        |SELECT id, n_bg, lm_score,
        |       CASE WHEN lm_score >= p66 THEN 'head'
        |            WHEN lm_score >= p33 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM lm, th ORDER BY id""".stripMargin)
}
