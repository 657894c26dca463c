package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding storage — the 4× compression
  * a 100-TB vector corpus takes before ANN serving (per-dimension
  * min/max codebooks, the faiss `ScalarQuantizer(QT_8bit)` shape).
  *
  * Scale: ONE posexplode + groupBy(dim) pass for the per-dimension
  * bounds (dims rows total, regardless of corpus size), collapsed to a
  * single codebook row and broadcast back; encode/decode are then
  * scan-local arithmetic. Codes are exact integers; the
  * reconstruction-error column is identical-operand double arithmetic
  * rounded to 6dp, so the whole output is engine- and
  * partitioning-exact. Constant dimensions (max == min) encode to 0
  * and reconstruct to the constant.
  */
object Quantize {

  /** Long-form codes: (id, j, code ∈ [0,255], abs_err) — one row per
    * vector dimension; `code = round((x−mn_j)/(mx_j−mn_j)·255)`,
    * `abs_err = |x − (mn_j + code/255·(mx_j−mn_j))|`.
    */
  def int8(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val st = corpus
      .select(posexplode(col(vecCol)).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(sort_array(collect_list(
        struct(col("j"), col("mn"), col("mx")))).as("cb"))
    val long = corpus.crossJoin(broadcast(st))
      .select(col(idCol), col("cb"),
        posexplode(col(vecCol)).as(Seq("j", "x")))
    val mn = element_at(col("cb"), col("j") + 1).getField("mn")
    val mx = element_at(col("cb"), col("j") + 1).getField("mx")
    val xd = col("x").cast("double")
    val code = when(mx > mn,
      round((xd - mn) / (mx - mn) * lit(255.0)).cast("int"))
      .otherwise(lit(0))
    val deq = mn + code.cast("double") / lit(255.0) * (mx - mn)
    long.select(col(idCol), col("j"), code.as("code"),
      round(abs(xd - deq), 6).as("abs_err"))
  }
}
