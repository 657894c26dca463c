package graft.queries

import graft.core.{Pins, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` as
  * oracle-checked queries (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, embedding cosine). All hash pipelines are md5-derived
  * integer arithmetic — bit-identical across engines, so outputs
  * except cosine need NO rounding.
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("h")),

    // Bloom ingest gate, two-phase: row-local mightContain splits the
    // batch, only the maybe-seen sliver pays the (broadcast) exact
    // confirmation — output is EXACTLY the truly-new rows, so the
    // oracle is a plain anti-join; the fpp moves work, never rows
    "q_bloom_decontam" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("k"))
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), md5(col("text")).as("k"))
      graft.ops.BloomGate.decontaminate(batch, corpus, "k",
          expectedItems = 200000L, numBits = 1600000L)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    "q_dedup_ngram_jaccard" -> ((s, dir) =>
      Pins.sortedOnce(
        Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 3, minJac = 0.05, maxDocFreq = 100),
        col("i"), col("j"))),

    "q_dedup_minhash_lsh" -> ((s, dir) =>
      Pins.sortedOnce(
        Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", numHashes = 16, rowsPerBand = 8, n = 3),
        col("i"), col("j"))),

    // sortedOnce on this file's expensive-frontier queries: the final
    // global sort otherwise executes the fingerprint / pair work twice
    // (RangePartitioner sample + shuffle — see Pins.sortedOnce)
    "q_dedup_simhash" -> ((s, dir) =>
      Pins.sortedOnce(
        Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id", "text",
          bits = 32),
        col("id"))),

    "q_dedup_simhash_pairs" -> ((s, dir) => {
      val fp = Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id",
        "text", bits = 32)
      Pins.sortedOnce(
        Dedup.simhashPairs(fp, maxDist = 6)
          .select(col("i"), col("j"), col("hamming").cast("int").as("hamming")),
        col("i"), col("j"))
    }),

    // pigeonhole-bucketed scale path — identical rows to
    // q_dedup_simhash_pairs (same oracle). NOTE: 32 bits / maxDist 6
    // is the parity config and the WORST case for bucketing (4-5-bit
    // blocks → dense buckets); q_dedup_simhash60_pairs_bucketed below
    // is the production-shaped config.
    "q_dedup_simhash_pairs_bucketed" -> ((s, dir) => {
      val fp = Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id",
        "text", bits = 32)
      Pins.sortedOnce(
        Dedup.simhashPairsBucketed(fp, maxDist = 6, bits = 32)
          .select(col("i"), col("j"), col("hamming").cast("int").as("hamming")),
        col("i"), col("j"))
    }),

    // the config that survives 100 TB: 60-bit fingerprint, maxDist 3
    // → four 15-bit blocks, near-singleton buckets, candidate count
    // ~linear in n instead of quadratic-in-bucket-size
    "q_dedup_simhash60_pairs_bucketed" -> ((s, dir) => {
      val fp = Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id",
        "text", bits = 60)
      Pins.sortedOnce(
        Dedup.simhashPairsBucketed(fp, maxDist = 3, bits = 60)
          .select(col("i"), col("j"), col("hamming").cast("int").as("hamming")),
        col("i"), col("j"))
    }),

    "q_dedup_embed_cos" -> ((s, dir) =>
      Pins.sortedOnce(
        Dedup.embeddingPairs(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", minCos = 0.4)
          .select(col("i"), col("j"), round(col("cos"), 6).as("cos")),
        col("i"), col("j"))),

    // pairs → clusters: connected components over the n-gram-Jaccard
    // near-dup edges (same parameters as q_dedup_ngram_jaccard);
    // comp = min doc id reachable = the canonical keeper
    "q_dedup_cc" -> ((s, dir) => {
      val edges = Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", n = 3, minJac = 0.05, maxDocFreq = 100)
      Dedup.connectedComponents(edges.select(col("i"), col("j")))
        .orderBy("node")
    }),

    // entity-resolution capstone: blocking (n-gram Jaccard pairs) →
    // clustering (connected components) → canonical entity records.
    // Every doc joins its component (singletons become their own
    // entity); the rollup and the canonical-attribute join are both
    // id-keyed; the component table holds near-dup nodes only (a
    // small fraction of the corpus), so the left join broadcasts at
    // scale
    "q_entity_resolution" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJac = 0.05, maxDocFreq = 100)
      val comps = Dedup.connectedComponents(
        edges.select(col("i"), col("j")))
      val membership = docs.select(col("doc_id"))
        .join(comps.withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("entity_id"))
      val rollup = membership.groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_members"),
          max(col("doc_id")).as("max_member"))
      rollup.join(docs.select(col("doc_id").as("entity_id"),
          col("lang"), col("source")), Seq("entity_id"))
        .orderBy("entity_id")
    }),

    // the keep/drop DECISION table: every LSH band key awarded to its
    // min doc id; a doc survives iff it wins all its bands (the
    // batch-deterministic form of the streaming ingest gate)
    "q_dedup_gate" -> ((s, dir) =>
      graft.streaming.StreamingOps.nearDupKeepBatch(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          numHashes = 16, rowsPerBand = 4, n = 3)
        .orderBy("doc_id")),

    // document-REWRITING dedup: C4/Lee-style duplicate-span scrub —
    // 3-grams in >4 documents are boilerplate; their token positions
    // are dropped and the text rebuilt
    "q_dedup_span_scrub" -> ((s, dir) =>
      Pins.sortedOnce(
        Dedup.scrubDuplicateSpans(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 3, maxDf = 4),
        col("id"))))

  /** Shared SQL: distinct HASHED 3-gram shingles — 60-bit md5-prefix
    * ints, mirroring the engine's at-source shingle hashing (1-based
    * indexing matches the Spark element_at windows; list_distinct over
    * the hashed values mirrors Spark's array_distinct, so any hash
    * collision collapses identically in both engines).
    */
  private val shSql =
    """sh AS (
      |  SELECT doc_id AS id, unnest(list_distinct(
      |    list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |      i -> ('0x' || substr(md5(
      |             string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
      |             || ' ' || string_split(text, ' ')[i+2]), 1, 15))::BIGINT))) AS sh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3)""".stripMargin

  private val sigSql =
    """sig AS (
      |  SELECT id, i, min(h) AS mh FROM (
      |    SELECT id,
      |           unnest(generate_series(0, 15)) AS i,
      |           unnest(list_transform(generate_series(0, 15),
      |             i -> ((i * 2 + 3) * xp + (i * 5 + 7)) % 1000000007)) AS h
      |    FROM (SELECT id, sh % 1000000007 AS xp FROM sh))
      |  GROUP BY id, i)""".stripMargin

  /** All-pairs simhash SQL (DuckDB) parameterized on fingerprint width
    * and Hamming threshold — the bucketed engine variants must be
    * row-identical to this answer.
    */
  private def simhashPairsSqlFor(bits: Int, maxDist: Int): String =
    s"""WITH tokh AS (
      |  SELECT doc_id AS id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |bits AS (
      |  SELECT id, b, sum(((h >> b) & 1) * 2 - 1) AS s
      |  FROM tokh CROSS JOIN (SELECT unnest(generate_series(0, ${bits - 1})) AS b)
      |  GROUP BY id, b),
      |fp AS (SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
      |                               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      |       FROM bits GROUP BY id)
      |SELECT a.id AS i, b.id AS j,
      |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |FROM fp a JOIN fp b ON a.id < b.id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
      |ORDER BY i, j""".stripMargin

  private val simhashPairsSql = simhashPairsSqlFor(bits = 32, maxDist = 6)

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS h,
        |       count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    // the gate's two-phase output is exactly the truly-new rows
    "q_bloom_decontam" ->
      """WITH corpus AS (SELECT md5(text) AS k FROM documents
        |                WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, md5(text) AS k FROM documents
        |      WHERE doc_id % 3 = 0)
        |SELECT doc_id FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.k = b.k)
        |ORDER BY doc_id""".stripMargin,

    // mirrors the engine's maxDocFreq=100 stop-shingle cap: shingles
    // in >100 documents leave the shingle space before sizes/pairs
    "q_dedup_ngram_jaccard" -> (s"WITH $shSql,\n" +
      """shf AS (SELECT id, sh FROM sh
        |        WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100)),
        |sz AS (SELECT id, count(*) AS sz FROM shf GROUP BY id),
        |it AS (SELECT a.id AS i, b.id AS j, count(*) AS inter
        |       FROM shf a JOIN shf b ON a.sh = b.sh AND a.id < b.id
        |       GROUP BY a.id, b.id)
        |SELECT i, j, inter, sa.sz + sb.sz - inter AS un,
        |       CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jac
        |FROM it JOIN sz sa ON it.i = sa.id JOIN sz sb ON it.j = sb.id
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.05
        |ORDER BY i, j""".stripMargin),

    "q_dedup_minhash_lsh" -> (s"WITH $shSql,\n$sigSql,\n" +
      """bands AS (SELECT id, i // 8 AS band,
        |                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS key
        |          FROM sig GROUP BY id, i // 8),
        |cand AS (SELECT DISTINCT a.id AS i, b.id AS j
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        |est AS (SELECT cand.i, cand.j,
        |               CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE)
        |                 / CAST(16 AS DOUBLE) AS est
        |        FROM cand JOIN sig sa ON sa.id = cand.i
        |        JOIN sig sb ON sb.id = cand.j AND sb.i = sa.i
        |        GROUP BY cand.i, cand.j),
        |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
        |it AS (SELECT cand.i, cand.j, count(*) AS inter
        |       FROM cand JOIN sh a ON a.id = cand.i
        |       JOIN sh b ON b.id = cand.j AND b.sh = a.sh
        |       GROUP BY cand.i, cand.j)
        |SELECT est.i, est.j, est.est,
        |       CAST(coalesce(it.inter, 0) AS DOUBLE)
        |         / CAST(sa.sz + sb.sz - coalesce(it.inter, 0) AS DOUBLE) AS jac
        |FROM est LEFT JOIN it ON est.i = it.i AND est.j = it.j
        |JOIN sz sa ON est.i = sa.id JOIN sz sb ON est.j = sb.id
        |ORDER BY est.i, est.j""".stripMargin),

    "q_dedup_simhash" ->
      """WITH tokh AS (
        |  SELECT doc_id AS id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |bits AS (
        |  SELECT id, b, sum(((h >> b) & 1) * 2 - 1) AS s
        |  FROM tokh CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
        |  GROUP BY id, b)
        |SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
        |                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |FROM bits GROUP BY id ORDER BY id""".stripMargin,

    "q_dedup_simhash_pairs" -> simhashPairsSql,

    // bucketed variants must be row-identical to the all-pairs answer
    "q_dedup_simhash_pairs_bucketed" -> simhashPairsSql,
    "q_dedup_simhash60_pairs_bucketed" ->
      simhashPairsSqlFor(bits = 60, maxDist = 3),

    // transitive closure over the same near-dup edge set (tiny graph:
    // only docs with a near-dup partner); comp = min reachable id
    "q_dedup_cc" -> (s"WITH RECURSIVE $shSql,\n" +
      """shf AS (SELECT id, sh FROM sh
        |        WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100)),
        |sz AS (SELECT id, count(*) AS sz FROM shf GROUP BY id),
        |it AS (SELECT a.id AS i, b.id AS j, count(*) AS inter
        |       FROM shf a JOIN shf b ON a.sh = b.sh AND a.id < b.id
        |       GROUP BY a.id, b.id),
        |e AS (SELECT i, j
        |      FROM it JOIN sz sa ON it.i = sa.id JOIN sz sb ON it.j = sb.id
        |      WHERE CAST(inter AS DOUBLE)
        |            / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.05),
        |und AS (SELECT i AS a, j AS b FROM e
        |        UNION ALL SELECT j AS a, i AS b FROM e),
        |reach(a, b) AS (SELECT a, b FROM und
        |                UNION
        |                SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
        |SELECT a AS node, least(a, min(b)) AS comp
        |FROM reach GROUP BY a ORDER BY node""".stripMargin),

    // the q_dedup_cc closure + singleton fill-in + canonical rollup
    "q_entity_resolution" -> (s"WITH RECURSIVE $shSql,\n" +
      """shf AS (SELECT id, sh FROM sh
        |        WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100)),
        |sz AS (SELECT id, count(*) AS sz FROM shf GROUP BY id),
        |it AS (SELECT a.id AS i, b.id AS j, count(*) AS inter
        |       FROM shf a JOIN shf b ON a.sh = b.sh AND a.id < b.id
        |       GROUP BY a.id, b.id),
        |e AS (SELECT i, j
        |      FROM it JOIN sz sa ON it.i = sa.id JOIN sz sb ON it.j = sb.id
        |      WHERE CAST(inter AS DOUBLE)
        |            / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.05),
        |und AS (SELECT i AS a, j AS b FROM e
        |        UNION ALL SELECT j AS a, i AS b FROM e),
        |reach(a, b) AS (SELECT a, b FROM und
        |                UNION
        |                SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |cc AS (SELECT a AS node, least(a, min(b)) AS comp
        |       FROM reach GROUP BY a),
        |mem AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS entity_id
        |        FROM documents d LEFT JOIN cc c ON c.node = d.doc_id),
        |r AS (SELECT entity_id, count(*) AS n_members,
        |             max(doc_id) AS max_member
        |      FROM mem GROUP BY entity_id)
        |SELECT r.entity_id, r.n_members, r.max_member, d.lang, d.source
        |FROM r JOIN documents d ON d.doc_id = r.entity_id
        |ORDER BY entity_id""".stripMargin),

    "q_dedup_embed_cos" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |d AS (SELECT a.vec_id AS i, b.vec_id AS j,
        |             list_reduce(list_transform(list_zip(a.x, b.x),
        |               z -> z[1] * z[2]), (p, q) -> p + q) AS dot,
        |             list_reduce(list_transform(a.x, e -> e * e), (p, q) -> p + q) AS na,
        |             list_reduce(list_transform(b.x, e -> e * e), (p, q) -> p + q) AS nb
        |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT i, j, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
        |FROM d WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.4
        |ORDER BY i, j""".stripMargin,

    // band keys rebuilt from the same mod-P signature (sigSql); the
    // string key is the ','-join of the 4 in-band minima in i order
    "q_dedup_gate" -> (s"WITH $shSql,\n$sigSql,\n" +
      """bands AS (SELECT id, i // 4 AS band,
        |                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS key
        |          FROM sig GROUP BY id, i // 4),
        |w AS (SELECT band, key, min(id) AS winner
        |      FROM bands GROUP BY band, key),
        |v AS (SELECT b.id AS doc_id, count(*) AS n_bands,
        |             CAST(sum(CASE WHEN w.winner = b.id THEN 1 ELSE 0 END) AS BIGINT) AS n_won
        |      FROM bands b JOIN w ON b.band = w.band AND b.key = w.key
        |      GROUP BY b.id)
        |SELECT doc_id, n_bands, n_won,
        |       CASE WHEN n_won = n_bands THEN 1 ELSE 0 END AS keep
        |FROM v ORDER BY doc_id""".stripMargin),

    // duplicate-span scrub: covered = any position inside a 3-gram
    // with document frequency > 4; text rebuilt from survivors
    "q_dedup_span_scrub" ->
      """WITH toks AS (SELECT doc_id AS id, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT id, unnest(generate_series(1, len(tk) - 2)) AS i, tk
        |      FROM toks WHERE len(tk) >= 3),
        |gh2 AS (SELECT id, i, ('0x' || substr(md5(tk[i] || ' ' || tk[i+1]
        |          || ' ' || tk[i+2]), 1, 15))::BIGINT AS gh FROM g),
        |dup AS (SELECT gh FROM (SELECT gh, count(DISTINCT id) AS df
        |                        FROM gh2 GROUP BY gh) WHERE df > 4),
        |covp AS (SELECT DISTINCT id, p FROM (
        |  SELECT g2.id, unnest(generate_series(g2.i, g2.i + 2)) AS p
        |  FROM gh2 g2 JOIN dup USING (gh))),
        |tokl AS (SELECT id, unnest(tk) AS tok,
        |                unnest(generate_series(1, len(tk))) AS p FROM toks),
        |kept AS (SELECT t.id, t.p, t.tok FROM tokl t
        |         ANTI JOIN covp c ON t.id = c.id AND t.p = c.p),
        |clean AS (SELECT id, string_agg(tok, ' ' ORDER BY p) AS text_clean,
        |                 count(*) AS n_kept FROM kept GROUP BY id)
        |SELECT t.id, coalesce(c.text_clean, '') AS text_clean,
        |       coalesce(c.n_kept, 0) AS n_kept,
        |       len(t.tk) - coalesce(c.n_kept, 0) AS n_dropped
        |FROM toks t LEFT JOIN clean c USING (id) ORDER BY t.id""".stripMargin)
}
