package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side shapes are real (schema, partitioning, batch
  * signatures, codegen'd byte ops); the actual media DECODE is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecode`) because no
  * image/audio codec libraries exist in this environment — on a real
  * cluster the stub body is replaced by the codec call (e.g. a
  * batch-vectorized decoder inside mapInPandas/mapPartitions), and
  * nothing else changes.
  *
  * At 100 TB: payloads stay columnar binary in parquet (never
  * driver-collected), per-row ops fuse into the scan, and
  * frame-sampling reduces bytes BEFORE any shuffle.
  */
object Multimodal {

  /** Wrap raw text bytes as the opaque payload column (the testdata
    * has no real media; the plumbing is payload-agnostic).
    */
  def payload(text: Column): Column = text.cast("binary")

  def payloadBytes(p: Column): Column = octet_length(p)

  /** STUB decode — deterministic fake metadata derived from sizes
    * (`???`-equivalent; replace with a real codec on a cluster):
    * width  = 1 + n_bytes mod 64
    * height = 1 + n_bytes mod 48
    * format = 'fake/' + (n_bytes mod 3)
    */
  def fakeDecodeMeta(p: Column): Column = struct(
    (payloadBytes(p) % 64 + lit(1)).as("width"),
    (payloadBytes(p) % 48 + lit(1)).as("height"),
    concat(lit("fake/"), (payloadBytes(p) % 3).cast("string")).as("format"))

  /** "Resize": keep the first `n` bytes of the payload (deterministic
    * stand-in for a real resample; exercises binary slicing).
    */
  def resize(p: Column, n: Int): Column = substring(p, 1, n)

  /** "Frame-sample" a text payload: every `stride`-th character —
    * the stride-slicing dataflow of video frame extraction.
    */
  def frameSample(text: Column, stride: Int): Column =
    array_join(
      transform(sequence(lit(1), length(text), lit(stride)),
        i => text.substr(i, lit(1))), "")

  /** Full multimodal feature row for a documents-like table. */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = payload(col(textCol))
    docs.select(
      col(idCol).as("id"),
      payloadBytes(p).as("n_bytes"),
      fakeDecodeMeta(p).as("meta"),
      md5(resize(p, 64)).as("head_hash"),
      md5(frameSample(col(textCol), 8).cast("binary")).as("frames_hash"))
  }
}
