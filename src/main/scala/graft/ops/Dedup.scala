package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (content hash), n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. Everything is hash-partitioned
  * relational dataflow — group-bys on content keys, explodes bounded
  * by shingle counts, band-bucket joins instead of all-pairs — the
  * shapes that survive a 100-TB corpus. All hash functions are
  * arithmetic-only (md5-derived integers) so results are
  * engine-independent and DuckDB-checkable.
  */
object Dedup {

  val P = 1000000007L

  /** Exact duplicate groups by normalized-content MD5. One shuffle on
    * the hash; map-side combine.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Distinct word n-gram shingles per document, exploded to
    * (id, shingle) rows. Shingles are 1-based element_at windows so
    * the DuckDB mirror (1-based lists) lines up.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // guard: Spark sequence(1, k) DESCENDS for k < 1 — short docs
    // must produce an empty shingle set instead
    val idx = when(size(toks) >= n, sequence(lit(1), size(toks) - lit(n - 1)))
      .otherwise(array().cast("array<int>"))
    val sh = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    docs.select(col(idCol).as("id"), explode(array_distinct(sh)).as("sh"))
  }

  /** Candidate pairs sharing ≥1 shingle with exact Jaccard ≥ minJac.
    * The shingle self-join is an equi-join on the shingle (shuffle on
    * content, not all-pairs); pair aggregation is one group-by.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJac: Double = 0.05): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.select(col("id").as("i"), col("sz").as("sza")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("sz").as("szb")), Seq("j"))
      .select(col("i"), col("j"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("un"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("jac"))
      .filter(col("jac") >= minJac)
    out
  }

  /** Shingle → 60-bit integer via md5 prefix (engine-independent). */
  def shingleInt(sh: Column): Column =
    conv(substring(md5(sh), 1, 15), 16, 10).cast("long")

  /** MinHash signatures: numHashes universal-hash minima per doc.
    * Returns (id, i, mh).
    */
  def minhashSignature(sh: DataFrame, numHashes: Int = 16): DataFrame = {
    val xp = (shingleInt(col("sh")) % P).as("xp")
    val hashes = transform(sequence(lit(0), lit(numHashes - 1)), i =>
      ((i.cast("long") * 2L + 3L) * col("xp") + (i.cast("long") * 5L + 7L)) % P)
    sh.select(col("id"), xp)
      .select(col("id"), posexplode(hashes).as(Seq("i", "h")))
      .groupBy(col("id"), col("i")).agg(min(col("h")).as("mh"))
  }

  /** LSH band-bucket candidate pairs + estimated (minhash-agreement)
    * and exact Jaccard. Bands of `rowsPerBand` signature rows; docs
    * sharing any band key become candidates — the join is on the band
    * key (content-addressed), never all-pairs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 16, rowsPerBand: Int = 4,
                      n: Int = 3): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = minhashSignature(sh, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sig
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          s => s.getField("mh").cast("string"))).as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
    // estimated similarity: fraction of agreeing minhashes
    val est = cand
      .join(sig.select(col("id").as("i"), col("i").as("hi"), col("mh").as("ma")), Seq("i"))
      .join(sig.select(col("id").as("j"), col("i").as("hj"), col("mh").as("mb")), Seq("j"))
      .filter(col("hi") === col("hj"))
      .groupBy(col("i"), col("j"))
      .agg((sum(when(col("ma") === col("mb"), 1).otherwise(0)).cast("double") /
        lit(numHashes.toDouble)).as("est"))
    // exact jaccard for verification
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("id").as("i"), col("sh").as("sha")), Seq("i"))
      .join(sh.select(col("id").as("j"), col("sh").as("shb")), Seq("j"))
      .filter(col("sha") === col("shb"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
    est.join(inter, Seq("i", "j"), "left")
      .join(sizes.select(col("id").as("i"), col("sz").as("sza")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("sz").as("szb")), Seq("j"))
      .select(col("i"), col("j"), col("est"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))).cast("double"))
          .as("jac"))
  }

  /** SimHash fingerprint over `bits` bit positions of md5-derived
    * token hashes: bit b set iff Σ_tokens (2·bit_b(h) − 1) > 0.
    * Returns (id, simhash).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("id"), shingleInt(col("tok")).as("h"))
    val contrib = tok
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .select(col("id"), col("b"),
        (expr("shiftright(h, b)").bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as("c"))
    contrib.groupBy(col("id"), col("b")).agg(sum(col("c")).as("s"))
      .groupBy(col("id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist. (All-pairs
    * at parity scale; the scale path buckets by simhash prefix first.)
    */
  def simhashPairs(sims: DataFrame, maxDist: Int): DataFrame =
    sims.select(col("id").as("i"), col("simhash").as("ha"))
      .join(sims.select(col("id").as("j"), col("simhash").as("hb")),
        col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxDist)

  /** Cosine over float-narrowed embeddings, computed in double with
    * fixed sequential order (oracle-parity).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-dup pairs with cosine ≥ minCos (brute-force at
    * parity scale; the scale path is LSH/IVF bucketing — see
    * Similarity).
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     minCos: Double): DataFrame =
    emb.select(col(idCol).as("i"), col(vecCol).as("va"))
      .join(emb.select(col(idCol).as("j"), col(vecCol).as("vb")),
        col("i") < col("j"))
      .select(col("i"), col("j"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
}
