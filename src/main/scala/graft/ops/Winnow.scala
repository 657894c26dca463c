package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03; the MOSS algorithm): hash every token k-gram, slide a
  * window of `w` consecutive hashes, and keep each window's minimum —
  * rightmost position on ties. The selected set is position-robust
  * (guaranteed fingerprint density ~2/(w+1), at least one per window),
  * the standard near-copy detection fingerprint where mod-p sampling
  * can miss arbitrarily long matches.
  *
  * Dataflow: one scan-fused gram explode, then ONE pass over a
  * per-document ordered window frame — parallel across documents, no
  * self-join, no shuffle beyond the per-doc window sort. The
  * rightmost-min selection is a single `min` over an ENCODED key
  * `h * 2^32 + (2^32-1-pos)`: minimal hash first, then maximal
  * position (integer arithmetic only, so the DuckDB oracle runs the
  * identical encoding). Hashes are 28-bit md5 prefixes so the encoded
  * key fits a BIGINT with positions up to 2^32.
  */
object Winnow {

  private val PosRange = 4294967296L // 2^32

  /** 28-bit md5-prefix gram hash (7 hex digits, engine-independent):
    * the digest's top 28 bits = its top 60 bits >>> 32, so the
    * codegen'd [[graft.functions.Md5Prefix60]] kernel serves here too
    * (bit-equality with the conv/substring SQL form is spec-pinned).
    */
  def gramHash28(gram: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftright(graft.functions.Md5Prefix60.md5_prefix60(gram), 32)

  /** Selected fingerprints (id, pos, h) — pos is the 1-based k-gram
    * start, h the 28-bit gram hash. Documents with fewer than
    * `k + w - 1` tokens contribute the minimum of their (shorter)
    * single window.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 5): DataFrame = {
    require(k > 0 && w > 0)
    val toks = TextAnalysis.tokens(col(textCol))
    val idx = when(size(col("toks")) >= k,
        sequence(lit(1), size(col("toks")) - lit(k - 1)))
      .otherwise(array().cast("array<int>"))
    // gram built AFTER the explode (codegen'd, evaluated once — see
    // Dedup.shingles for why hashing inside the array is a trap)
    val grams = docs.select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"), col("toks"), explode(idx).as("pos"))
      .select(col("id"), col("pos").cast("long").as("pos"),
        gramHash28(concat_ws(" ",
          (0 until k).map(o => element_at(col("toks"), col("pos") + lit(o))): _*))
          .as("h"))
    // frame = the w hashes starting at this row; every full window
    // contributes its rightmost-min. Short documents (< w grams) have
    // no full window — their single partial window at pos 1 stands in,
    // so every document yields >= 1 fingerprint.
    val frame = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val enc = col("h") * lit(PosRange) + (lit(PosRange - 1) - col("pos"))
    val winMin = grams
      .withColumn("wmin", min(enc).over(frame))
      .withColumn("wlen", count(lit(1)).over(frame))
      .filter(col("wlen") === w || col("pos") === 1)
      // integer div, NOT `/` (double division loses precision > 2^53)
      .select(col("id"), expr(s"wmin div ${PosRange}L").as("h"),
        (lit(PosRange - 1) - pmod(col("wmin"), lit(PosRange))).as("pos"))
    winMin.distinct()
  }
}
