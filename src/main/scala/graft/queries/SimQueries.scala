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
  // shared sizing targets for the auto-sized scale twins — interpolated
  // into BOTH the Spark lambdas and the DuckDB oracle SQL so the
  // replayed integer sizing can never drift from the executed one
  private val TargetPerBucket = 500
  private val TargetPerCell = 1000
  // Scala sizing caps planes at 30 when no p in 1..30 reaches the
  // bucket target (corpus > 500·2^30); the oracle mirrors via COALESCE
  private val MaxPlanes = 30
  // q_sim_semdedup_2level's per-cell target: small enough that the
  // gate corpus (500 vectors at sf0.01) produces cells ≫ ⌈√cells⌉
  // coarse groups, so the two-level route is genuinely multi-group
  // at oracle scale (20 cells / 5 groups of 4)
  private val TwoLevelTarget = 25

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

    "q_sim_ivf_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", numCells = 8, k = 3)
        .select(col("qid"), col("cell"), col("rank"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),

    "q_sim_buckets" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      emb.select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), Dims, Planes).as("bucket"))
        .orderBy("vec_id")
    }),

    // per-label centroids, long-form — one map-side-combined shuffle
    // of |labels|·dims partials; the class-prototype / cluster-seed op
    "q_embed_centroids" -> ((s, dir) =>
      Similarity.groupCentroids(Tables.load(s, dir, "embeddings"),
          "label", "embedding")
        .select(col("grp"), col("dim"),
          round(col("centroid"), 6).as("centroid"), col("n"))
        .orderBy("grp", "dim")),

    // embedding near-dup at scale: LSH-bucket equi-join instead of the
    // all-pairs join of q_dedup_embed_cos
    "q_dedup_embed_lsh" -> ((s, dir) =>
      graft.core.Pins.sortedOnce(
        graft.ops.Dedup.embeddingPairsLsh(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", dims = Dims, numPlanes = Planes, minCos = 0.4)
          .select(col("bucket"), col("i"), col("j"),
            round(col("cos"), 6).as("cos")),
        col("i"), col("j"))),

    // the 100-TB shape of the LSH near-dup: planes AUTO-SIZED from one
    // corpus count (smallest p with 2^p >= ceil(n/500), pure integer
    // arithmetic) — a FIXED plane count like the 4-plane parity config
    // above is quadratic-over-2^planes (370 s at sf10's 200k vectors:
    // 16 buckets of 12.5k); this one holds expected occupancy ~500 at
    // any scale. Both stay on the correctness gate.
    "q_dedup_embed_lsh_auto" -> ((s, dir) =>
      graft.core.Pins.sortedOnce(
        graft.ops.Dedup.embeddingPairsLshAuto(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", dims = Dims,
            targetPerBucket = TargetPerBucket, minCos = 0.4)
          .select(col("bucket"), col("i"), col("j"),
            round(col("cos"), 6).as("cos")),
        col("i"), col("j"))),

    // SemDeDup-style semantic dedup: coarse-quantizer clustering +
    // within-cell greedy leader rule (keep = no earlier-id neighbor
    // with cos >= tau); one verdict row per input vector
    "q_sim_semdedup" -> ((s, dir) =>
      graft.core.Pins.sortedOnce(
        Similarity.semDedup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", numCells = 8, tau = 0.4),
        col("vec_id"))),

    // the 100-TB shape of q_sim_semdedup: cells AUTO-SIZED to
    // ~targetPerCell vectors from one corpus count, so the within-cell
    // O(Σ|cell|²) witness join stays bounded at ANY corpus size —
    // the fixed-8-cell variant above is the mechanics/parity config
    // (at sf10's 200k vectors its 25k-vector cells cost 518 s where
    // this one's ~1k-vector cells keep the same greedy-leader rule
    // linear-ish; both stay on the correctness gate)
    "q_sim_semdedup_auto" -> ((s, dir) =>
      graft.core.Pins.sortedOnce(
        Similarity.semDedupAuto(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", tau = 0.4, targetPerCell = TargetPerCell),
        col("vec_id"))),

    // the >LiteralSafeCells route of semDedupAuto, exercised AT GATE
    // SCALE: twoLevelCellBound = 1 forces the two-level assignment
    // (coarse probe over ⌈√cells⌉ literal centroids, then a broadcast-
    // joined fine-candidate array fold — O(√cells·dims) per row where
    // the flat argmin is O(cells·dims)). The oracle replays the
    // identical two-level argmin, so the scale path is hash-checked,
    // not just the parity path.
    "q_sim_semdedup_2level" -> ((s, dir) =>
      graft.core.Pins.sortedOnce(
        Similarity.semDedupAuto(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", tau = 0.4, targetPerCell = TwoLevelTarget,
          twoLevelCellBound = 1),
        col("vec_id"))),

    // embedding near-dup ingest gate, batch-deterministic form:
    // banded sign-LSH buckets (independent plane family per band),
    // min-id wins each (band, bucket), survive iff all bands won —
    // the vector analog of q_dedup_gate
    "q_dedup_embed_gate" -> ((s, dir) =>
      graft.streaming.StreamingOps.embedDupKeepBatch(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          dims = Dims, planesPerBand = 4, numBands = 4)
        .orderBy("vec_id")),

    // the composed flavor: semantic dedup over the Lloyd-refined
    // quantizer (lloydIters = 1) — verifies the kmeans+semDedup
    // wiring end to end
    "q_sim_semdedup_kmeans" -> ((s, dir) =>
      graft.core.Pins.sortedOnce(
        Similarity.semDedup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", numCells = 8, tau = 0.4, lloydIters = 1),
        col("vec_id"))),

    // learned coarse quantizer: one Lloyd round (assign -> DECIMAL-
    // exact per-cell means, 6dp-rounded) from the deterministic init,
    // then the final cell assignment — the k-means upgrade slot of
    // the IVF/semDedup dataflow
    "q_sim_kmeans" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cent = Similarity.kmeansQuantizer(emb, "vec_id", "embedding",
        numCells = 8, iters = 1)
      Similarity.assignCells(emb, "vec_id", "embedding", cent)
        .orderBy("vec_id")
    }),

    // ANN quality evaluation: recall@5 of the LSH and IVF candidate
    // generators against the brute-force ground truth, per query and
    // macro (qid = -1). Both rankings are deterministic (identical
    // sequential dots, ties by vec_id), so the recall itself is
    // oracle-exact — macro recall derives from INTEGER hit sums, never
    // a float mean of floats
    "q_sim_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val truth = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        TopK).select(col("qid"), col("vec_id"))
      def hits(approx: DataFrame, m: String): DataFrame = {
        val h = truth
          .join(approx.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
        q.select(col("vec_id").as("qid")).join(h, Seq("qid"), "left")
          .select(lit(m).as("method"), col("qid"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      }
      val per = hits(Similarity.lshTopK(emb, q, "vec_id", "embedding",
          Dims, Planes, TopK), "lsh")
        .unionByName(hits(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          numCells = 8, k = TopK), "ivf"))
        .unionByName(hits(Similarity.ivfTopKProbe(emb, q, "vec_id",
          "embedding", numCells = 8, k = TopK, nprobe = 2), "ivf2"))
        .select(col("method"), col("qid"), col("n_hits"),
          round(col("n_hits").cast("double") / TopK, 6).as("recall"))
      val macroR = per.groupBy(col("method"))
        .agg(sum(col("n_hits")).as("n_hits"), count(lit(1)).as("nq"))
        .select(col("method"), lit(-1L).as("qid"), col("n_hits"),
          round(col("n_hits").cast("double")
            / (lit(TopK.toDouble) * col("nq").cast("double")), 6).as("recall"))
      per.unionByName(macroR).orderBy("method", "qid")
    }),

    // clustering quality: simplified silhouette vs the 1-round k-means
    // centroids — scan-fused sort of the same per-row (dist, cell)
    // structs the assignment folds over (Similarity.silhouette note)
    "q_sim_silhouette" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cent = Similarity.kmeansQuantizer(emb, "vec_id", "embedding",
        numCells = 8, iters = 1)
      Similarity.silhouette(emb, "vec_id", "embedding", cent)
        .orderBy("vec_id")
    }),

    // int8 scalar quantization codes + reconstruction error — the
    // embedding-compression pass (ops.Quantize scale note)
    "q_embed_quantize" -> ((s, dir) =>
      graft.ops.Quantize.int8(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding")
        .orderBy("vec_id", "j")))

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

  /** Shared Lloyd-round CTE chain (v → cent0/ca0 → a1 → cent1/ca1 →
    * a2): the deterministic init, one argmin assignment, one
    * DECIMAL-exact mean update with empty-cell fallback, and the
    * final assignment — mirrors `kmeansQuantizer(iters = 1)` +
    * `assignCells`.
    */
  private val lloydSql: String = {
    val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
    def argmin(ca: String, out: String) =
      s"""$out AS (SELECT vec_id, x, cell FROM (
         |  SELECT v.vec_id, v.x, $ca.cell,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           (${vv.format("v.x")}
         |            - 2 * ${dotSql.format("v.x", s"$ca.carr")}
         |            + ${vv.format(s"$ca.carr")}), $ca.cell) AS rk
         |  FROM v CROSS JOIN $ca) WHERE rk = 1)""".stripMargin
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |cent0 AS (SELECT CAST(vec_id % 8 AS INT) AS cell, j,
       |                 round(CAST(CAST(sum(CAST(x[j + 1] AS DECIMAL(38,15)))
       |                            AS VARCHAR) AS DOUBLE)
       |                       / CAST(count(*) AS DOUBLE), 6) AS c
       |          FROM v CROSS JOIN (SELECT unnest(generate_series(0, ${Dims - 1})) AS j)
       |          GROUP BY 1, 2),
       |ca0 AS (SELECT cell, list(c ORDER BY j) AS carr FROM cent0 GROUP BY cell),
       |${argmin("ca0", "a1")},
       |cent1u AS (SELECT a1.cell, j,
       |                  round(CAST(CAST(sum(CAST(x[j + 1] AS DECIMAL(38,15)))
       |                             AS VARCHAR) AS DOUBLE)
       |                        / CAST(count(*) AS DOUBLE), 6) AS c
       |           FROM a1 CROSS JOIN (SELECT unnest(generate_series(0, ${Dims - 1})) AS j)
       |           GROUP BY 1, 2),
       |cent1 AS (SELECT c0.cell, c0.j, coalesce(u.c, c0.c) AS c
       |          FROM cent0 c0 LEFT JOIN cent1u u
       |            ON u.cell = c0.cell AND u.j = c0.j),
       |ca1 AS (SELECT cell, list(c ORDER BY j) AS carr FROM cent1 GROUP BY cell),
       |${argmin("ca1", "a2")}""".stripMargin
  }

  // shared coarse-quantizer CTE chain (vec_id % 8 init centroids ->
  // per-vector argmin cell assignment over a `v` CTE) used identically
  // by the semdedup / IVF / recall oracles — one definition so the
  // distance arithmetic and tie-break can never drift between them.
  // Emitted pre-stripped; hosts embed it via interpolation inside
  // their own stripMargin strings (embedded lines carry no margins).
  private val quantizerCtes: String = quantizerCtesWith("vec_id % 8")

  /** [[quantizerCtes]] with the cell-index expression parametrized —
    * the auto-sized semdedup oracle derives it from a corpus count
    * (`vec_id % (SELECT cells FROM nc)`) instead of a constant.
    */
  private def quantizerCtesWith(cellExpr: String): String = {
    val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
    val dot = dotSql
    s"""cent AS (SELECT CAST($cellExpr AS INT) AS cell, j,
       |                round(CAST(CAST(sum(CAST(x[j + 1] AS DECIMAL(38,15)))
       |                           AS VARCHAR) AS DOUBLE)
       |                      / CAST(count(*) AS DOUBLE), 6) AS c
       |         FROM v CROSS JOIN (SELECT unnest(generate_series(0, ${Dims - 1})) AS j)
       |         GROUP BY 1, 2),
       |ca AS (SELECT cell, list(c ORDER BY j) AS carr FROM cent GROUP BY cell),
       |asgn AS (SELECT vec_id, x, cell FROM (
       |  SELECT v.vec_id, v.x, ca.cell,
       |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |           (${vv.format("v.x")}
       |            - 2 * ${dot.format("v.x", "ca.carr")}
       |            + ${vv.format("ca.carr")}), ca.cell) AS rk
       |  FROM v CROSS JOIN ca) WHERE rk = 1)""".stripMargin
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
         |SELECT vec_id, $bucketSql AS bucket FROM v ORDER BY vec_id""".stripMargin,

    "q_dedup_embed_lsh" -> {
      val dot = dotSql.format("a.x", "b.x")
      val na = dotSql.format("a.x", "a.x")
      val nb = dotSql.format("b.x", "b.x")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |bk AS (SELECT vec_id, x, $bucketSql AS bucket FROM v),
         |sc AS (SELECT a.bucket AS bucket, a.vec_id AS i, b.vec_id AS j,
         |              $dot / (sqrt($na) * sqrt($nb)) AS cos
         |       FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT bucket, i, j, round(cos, 6) AS cos
         |FROM sc WHERE cos >= CAST(0.4 AS DOUBLE) ORDER BY i, j""".stripMargin
    },

    // identical pair algebra; the plane count replays
    // embeddingPairsLshAuto's integer sizing (ceil-divide + shift
    // compare) from DuckDB's own count, and the bucket folds the
    // dynamic plane range with nested list lambdas instead of the
    // statically-unrolled per-plane CASE terms of q_dedup_embed_lsh
    "q_dedup_embed_lsh_auto" -> {
      val dot = dotSql.format("a.x", "b.x")
      val na = dotSql.format("a.x", "a.x")
      val nb = dotSql.format("b.x", "b.x")
      val autoBucket =
        s"""list_reduce(list_transform(generate_series(0, (SELECT p FROM np) - 1),
          |  bb -> CASE WHEN list_reduce(list_transform(generate_series(0, ${Dims - 1}),
          |               j -> x[j + 1] * CAST((bb * 37 + j * 101) % 19 - 9 AS DOUBLE)),
          |               (pa, qa) -> pa + qa) > CAST(0 AS DOUBLE)
          |        THEN CAST(1 AS BIGINT) << bb ELSE CAST(0 AS BIGINT) END),
          |  (pb, qb) -> pb + qb)""".stripMargin.replaceAll("\n", " ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |cnt AS (SELECT count(*) AS n FROM v),
         |tgt AS (SELECT GREATEST(CAST(1 AS BIGINT),
         |               (n + ${TargetPerBucket - 1}) // $TargetPerBucket) AS buckets
         |        FROM cnt),
         |np AS (SELECT COALESCE(min(k), $MaxPlanes) AS p
         |       FROM (SELECT unnest(generate_series(1, $MaxPlanes)) AS k) g, tgt
         |       WHERE (CAST(1 AS BIGINT) << k) >= tgt.buckets),
         |bk AS (SELECT vec_id, x, $autoBucket AS bucket FROM v),
         |sc AS (SELECT a.bucket AS bucket, a.vec_id AS i, b.vec_id AS j,
         |              $dot / (sqrt($na) * sqrt($nb)) AS cos
         |       FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT bucket, i, j, round(cos, 6) AS cos
         |FROM sc WHERE cos >= CAST(0.4 AS DOUBLE) ORDER BY i, j""".stripMargin
    },

    // exact DECIMAL sum (order-independent) mirrors groupCentroids;
    // float32 → double is lossless widening on both engines
    "q_embed_centroids" ->
      """WITH x AS (SELECT label AS grp,
        |                  unnest(generate_series(1, len(embedding))) AS dim,
        |                  unnest(CAST(embedding AS DOUBLE[])) AS v
        |           FROM embeddings)
        |SELECT grp, CAST(dim AS INT) AS dim,
        |       round(CAST(sum(CAST(v AS DECIMAL(38,15))) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS centroid,
        |       count(*) AS n
        |FROM x GROUP BY grp, dim ORDER BY grp, dim""".stripMargin,

    "q_sim_semdedup" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      val dot = dotSql
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |$quantizerCtes,
         |dup AS (SELECT a.vec_id AS i, min(b.vec_id) AS dup_of
         |        FROM asgn a JOIN asgn b
         |          ON a.cell = b.cell AND b.vec_id < a.vec_id
         |        WHERE round(${dot.format("a.x", "b.x")}
         |              / (sqrt(${vv.format("a.x")}) * sqrt(${vv.format("b.x")})), 6)
         |              >= CAST(0.4 AS DOUBLE)
         |        GROUP BY 1)
         |SELECT a.vec_id, a.cell,
         |       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS keep, d.dup_of
         |FROM asgn a LEFT JOIN dup d ON d.i = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    // identical greedy-leader algebra; cells derived from the corpus
    // count exactly as semDedupAuto does (ceil-divide in integer
    // arithmetic, floored at 1)
    "q_sim_semdedup_auto" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      val dot = dotSql
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |nc AS (SELECT GREATEST(CAST(1 AS BIGINT),
         |               (count(*) + ${TargetPerCell - 1}) // $TargetPerCell) AS cells
         |        FROM v),
         |${quantizerCtesWith("vec_id % (SELECT cells FROM nc)")},
         |dup AS (SELECT a.vec_id AS i, min(b.vec_id) AS dup_of
         |        FROM asgn a JOIN asgn b
         |          ON a.cell = b.cell AND b.vec_id < a.vec_id
         |        WHERE round(${dot.format("a.x", "b.x")}
         |              / (sqrt(${vv.format("a.x")}) * sqrt(${vv.format("b.x")})), 6)
         |              >= CAST(0.4 AS DOUBLE)
         |        GROUP BY 1)
         |SELECT a.vec_id, a.cell,
         |       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS keep, d.dup_of
         |FROM asgn a LEFT JOIN dup d ON d.i = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    // the two-level argmin replayed end to end: fine init centroids
    // (cell = vec_id % cells), coarse group = cell % ⌈√cells⌉, coarse
    // centroids = per-dim DECIMAL-exact 6dp means OF the fine
    // centroids, row → nearest coarse (dist, coarse) → nearest fine
    // WITHIN the group (dist, cell) — then the shared greedy-leader
    // rule. Distance/tie arithmetic identical to quantizerCtes.
    "q_sim_semdedup_2level" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      val dot = dotSql
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |nc AS (SELECT GREATEST(CAST(1 AS BIGINT),
         |               (count(*) + ${TwoLevelTarget - 1}) // $TwoLevelTarget) AS cells
         |        FROM v),
         |g AS (SELECT CAST(ceil(sqrt(CAST(cells AS DOUBLE))) AS BIGINT) AS ncoarse
         |      FROM nc),
         |cent AS (SELECT CAST(vec_id % (SELECT cells FROM nc) AS INT) AS cell, j,
         |                round(CAST(CAST(sum(CAST(x[j + 1] AS DECIMAL(38,15)))
         |                           AS VARCHAR) AS DOUBLE)
         |                      / CAST(count(*) AS DOUBLE), 6) AS c
         |         FROM v CROSS JOIN (SELECT unnest(generate_series(0, ${Dims - 1})) AS j)
         |         GROUP BY 1, 2),
         |ca AS (SELECT cell, list(c ORDER BY j) AS carr FROM cent GROUP BY cell),
         |co AS (SELECT CAST(cell % (SELECT ncoarse FROM g) AS INT) AS coarse, j,
         |              round(CAST(CAST(sum(CAST(c AS DECIMAL(38,15)))
         |                         AS VARCHAR) AS DOUBLE)
         |                    / CAST(count(*) AS DOUBLE), 6) AS c
         |       FROM cent GROUP BY 1, 2),
         |cca AS (SELECT coarse, list(c ORDER BY j) AS carr FROM co GROUP BY coarse),
         |rc AS (SELECT vec_id, x, coarse FROM (
         |  SELECT v.vec_id, v.x, cca.coarse,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           (${vv.format("v.x")}
         |            - 2 * ${dot.format("v.x", "cca.carr")}
         |            + ${vv.format("cca.carr")}), cca.coarse) AS rk
         |  FROM v CROSS JOIN cca) WHERE rk = 1),
         |asgn AS (SELECT vec_id, x, cell FROM (
         |  SELECT rc.vec_id, rc.x, ca.cell,
         |         row_number() OVER (PARTITION BY rc.vec_id ORDER BY
         |           (${vv.format("rc.x")}
         |            - 2 * ${dot.format("rc.x", "ca.carr")}
         |            + ${vv.format("ca.carr")}), ca.cell) AS rk
         |  FROM rc JOIN ca
         |    ON CAST(ca.cell % (SELECT ncoarse FROM g) AS INT) = rc.coarse)
         |  WHERE rk = 1),
         |dup AS (SELECT a.vec_id AS i, min(b.vec_id) AS dup_of
         |        FROM asgn a JOIN asgn b
         |          ON a.cell = b.cell AND b.vec_id < a.vec_id
         |        WHERE round(${dot.format("a.x", "b.x")}
         |              / (sqrt(${vv.format("a.x")}) * sqrt(${vv.format("b.x")})), 6)
         |              >= CAST(0.4 AS DOUBLE)
         |        GROUP BY 1)
         |SELECT a.vec_id, a.cell,
         |       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS keep, d.dup_of
         |FROM asgn a LEFT JOIN dup d ON d.i = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    // banded buckets rebuilt with the same plane family arithmetic
    // (plane index = band*4 + p); key is internal to the join, the
    // output is the per-vector verdict
    "q_dedup_embed_gate" -> {
      def dotp(p: Int) =
        s"""list_reduce(list_transform(generate_series(0, ${Dims - 1}),
           |  j -> x[j + 1] * CAST(((band * 4 + $p) * 37 + j * 101) % 19 - 9 AS DOUBLE)),
           |  (p, q) -> p + q)""".stripMargin.replaceAll("\n", " ")
      val key = (0 until 4).map(p =>
        s"CASE WHEN ${dotp(p)} > CAST(0 AS DOUBLE) THEN ${1L << p} ELSE 0 END")
        .mkString(" + ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |bands AS (SELECT vec_id, band, $key AS key
         |          FROM v CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)),
         |w AS (SELECT band, key, min(vec_id) AS winner
         |      FROM bands GROUP BY band, key),
         |g AS (SELECT b.vec_id, count(*) AS n_bands,
         |             CAST(sum(CASE WHEN w.winner = b.vec_id THEN 1 ELSE 0 END)
         |                  AS BIGINT) AS n_won
         |      FROM bands b JOIN w ON b.band = w.band AND b.key = w.key
         |      GROUP BY b.vec_id)
         |SELECT vec_id, n_bands, n_won,
         |       CASE WHEN n_won = n_bands THEN 1 ELSE 0 END AS keep
         |FROM g ORDER BY vec_id""".stripMargin
    },

    "q_sim_kmeans" ->
      s"""WITH $lloydSql
         |SELECT vec_id, cell FROM a2 ORDER BY vec_id""".stripMargin,

    // Lloyd CTEs + the semDedup leader rule over the refined cells
    "q_sim_semdedup_kmeans" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      s"""WITH $lloydSql,
         |dup AS (SELECT a.vec_id AS i, min(b.vec_id) AS dup_of
         |        FROM a2 a JOIN a2 b
         |          ON a.cell = b.cell AND b.vec_id < a.vec_id
         |        WHERE round(${dotSql.format("a.x", "b.x")}
         |              / (sqrt(${vv.format("a.x")}) * sqrt(${vv.format("b.x")})), 6)
         |              >= CAST(0.4 AS DOUBLE)
         |        GROUP BY 1)
         |SELECT a.vec_id, a.cell,
         |       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS keep, d.dup_of
         |FROM a2 a LEFT JOIN dup d ON d.i = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    "q_sim_ivf_topk" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      val dot = dotSql
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |$quantizerCtes,
         |sc AS (SELECT q.vec_id AS qid, q.cell AS cell, c.vec_id AS vec_id,
         |              ${dot.format("q.x", "c.x")}
         |              / (sqrt(${vv.format("q.x")}) * sqrt(${vv.format("c.x")})) AS cos
         |       FROM asgn q JOIN asgn c ON c.cell = q.cell AND c.vec_id != q.vec_id
         |       WHERE q.vec_id < 10),
         |rk AS (SELECT qid, cell, vec_id, cos,
         |              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |       FROM sc)
         |SELECT qid, cell, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
         |FROM rk WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    },

    "q_sim_recall" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      val dot = dotSql
      val cosExpr = s"${dot.format("q.x", "c.x")} / (sqrt(${vv.format("q.x")}) * sqrt(${vv.format("c.x")}))"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |qs AS (SELECT vec_id AS qid FROM v WHERE vec_id < 10),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY $cosExpr DESC, c.vec_id) AS rank
         |  FROM v q JOIN v c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < 10) WHERE rank <= $TopK),
         |bk AS (SELECT vec_id, x, $bucketSql AS bucket FROM v),
         |lsh AS (SELECT qid, vec_id FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY $cosExpr DESC, c.vec_id) AS rank
         |  FROM bk q JOIN bk c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
         |  WHERE q.vec_id < 10) WHERE rank <= $TopK),
         |$quantizerCtes,
         |ivf AS (SELECT qid, vec_id FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY $cosExpr DESC, c.vec_id) AS rank
         |  FROM asgn q JOIN asgn c ON c.cell = q.cell AND c.vec_id != q.vec_id
         |  WHERE q.vec_id < 10) WHERE rank <= $TopK),
         |probe AS (SELECT qid, cell FROM (
         |  SELECT v.vec_id AS qid, ca.cell,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           (${vv.format("v.x")}
         |            - 2 * ${dot.format("v.x", "ca.carr")}
         |            + ${vv.format("ca.carr")}), ca.cell) AS rk
         |  FROM v CROSS JOIN ca WHERE v.vec_id < 10) WHERE rk <= 2),
         |ivf2 AS (SELECT qid, vec_id FROM (
         |  SELECT p.qid AS qid, c.vec_id AS vec_id,
         |         row_number() OVER (PARTITION BY p.qid
         |           ORDER BY $cosExpr DESC, c.vec_id) AS rank
         |  FROM probe p JOIN v q ON q.vec_id = p.qid
         |  JOIN asgn c ON c.cell = p.cell AND c.vec_id != p.qid)
         |  WHERE rank <= $TopK),
         |per AS (
         |  SELECT 'lsh' AS method, qs.qid,
         |         (SELECT count(*) FROM truth t JOIN lsh a
         |            ON a.qid = t.qid AND a.vec_id = t.vec_id
         |          WHERE t.qid = qs.qid) AS n_hits
         |  FROM qs
         |  UNION ALL
         |  SELECT 'ivf' AS method, qs.qid,
         |         (SELECT count(*) FROM truth t JOIN ivf a
         |            ON a.qid = t.qid AND a.vec_id = t.vec_id
         |          WHERE t.qid = qs.qid) AS n_hits
         |  FROM qs
         |  UNION ALL
         |  SELECT 'ivf2' AS method, qs.qid,
         |         (SELECT count(*) FROM truth t JOIN ivf2 a
         |            ON a.qid = t.qid AND a.vec_id = t.vec_id
         |          WHERE t.qid = qs.qid) AS n_hits
         |  FROM qs),
         |rows_out AS (
         |  SELECT method, qid, n_hits,
         |         round(CAST(n_hits AS DOUBLE) / $TopK, 6) AS recall
         |  FROM per
         |  UNION ALL
         |  SELECT method, -1 AS qid, CAST(sum(n_hits) AS BIGINT) AS n_hits,
         |         round(CAST(sum(n_hits) AS DOUBLE)
         |               / (CAST($TopK AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6) AS recall
         |  FROM per GROUP BY method)
         |SELECT method, qid, n_hits, recall FROM rows_out
         |ORDER BY method, qid""".stripMargin
    },

    // same (vv − 2·x·c + c·c) distance shapes as the Lloyd argmin;
    // rk 1/2 over (dist, cell) are (a², own cell) and b²
    "q_sim_silhouette" -> {
      val vv = "list_reduce(list_transform(%s, e -> e * e), (p, q) -> p + q)"
      val dist = s"""(${vv.format("v.x")}
                    | - 2 * ${dotSql.format("v.x", "ca1.carr")}
                    | + ${vv.format("ca1.carr")})""".stripMargin
        .replaceAll("\n", " ")
      s"""WITH $lloydSql,
         |d AS (SELECT v.vec_id, ca1.cell, $dist AS d2,
         |             row_number() OVER (PARTITION BY v.vec_id
         |                                ORDER BY $dist, ca1.cell) AS rk
         |      FROM v CROSS JOIN ca1),
         |p AS (SELECT vec_id,
         |        max(CASE WHEN rk = 1 THEN cell END) AS cell,
         |        sqrt(greatest(max(CASE WHEN rk = 1 THEN d2 END),
         |                      CAST(0 AS DOUBLE))) AS a,
         |        sqrt(greatest(max(CASE WHEN rk = 2 THEN d2 END),
         |                      CAST(0 AS DOUBLE))) AS b
         |      FROM d WHERE rk <= 2 GROUP BY vec_id)
         |SELECT vec_id, cell,
         |       round(CASE WHEN greatest(a, b) > 0
         |                  THEN (b - a) / greatest(a, b)
         |                  ELSE CAST(0 AS DOUBLE) END, 6) AS sil
         |FROM p ORDER BY vec_id""".stripMargin
    },

    // per-dim min/max codebook + identical encode/decode arithmetic
    "q_embed_quantize" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
        |           FROM embeddings),
        |e AS (SELECT vec_id, j, x[j + 1] AS xv
        |      FROM v CROSS JOIN (SELECT unnest(generate_series(0, ${Dims - 1})) AS j)),
        |st AS (SELECT j, min(xv) AS mn, max(xv) AS mx FROM e GROUP BY j),
        |q AS (SELECT vec_id, e.j, xv, mn, mx,
        |        CASE WHEN mx > mn
        |             THEN CAST(round((xv - mn) / (mx - mn) * 255) AS INT)
        |             ELSE 0 END AS code
        |      FROM e JOIN st ON e.j = st.j)
        |SELECT vec_id, j, code,
        |       round(abs(xv - (mn + CAST(code AS DOUBLE) / 255 * (mx - mn))),
        |             6) AS abs_err
        |FROM q ORDER BY vec_id, j""".stripMargin)
}
