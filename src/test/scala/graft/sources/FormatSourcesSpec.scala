package graft.sources

import graft.SparkTestBase
import graft.core.{CsvSource, OrcSource, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC and CSV providers behind the SourceProvider seam: the same
  * engine operator must produce identical rows through every format.
  */
class FormatSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("OrcSource: full-fidelity parity including timestamps and arrays") {
    val tmp = java.nio.file.Files.createTempDirectory("orc_src").toString
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val ev = Tables.events(spark, dir)
    docs.write.orc(s"$tmp/documents.orc")
    emb.write.orc(s"$tmp/embeddings.orc")
    ev.write.orc(s"$tmp/events.orc")
    Tables.registerProvider("orc", OrcSource)
    try {
      spark.conf.set(Tables.SourceKey, "orc")
      val viaOrc = graft.ops.Dedup.exactGroups(
        Tables.load(spark, tmp, "documents"), "doc_id", "text")
      // array<float> embedding column survives byte-for-byte
      val embOrc = Tables.load(spark, tmp, "embeddings")
      // timestamp column survives (written post-normTs as TIMESTAMP_NTZ)
      val evOrc = Tables.load(spark, tmp, "events")
      spark.conf.unset(Tables.SourceKey)
      val viaParquet = graft.ops.Dedup.exactGroups(docs, "doc_id", "text")
      assert(viaOrc.schema == viaParquet.schema)
      assert(viaOrc.exceptAll(viaParquet).count() == 0)
      assert(viaParquet.exceptAll(viaOrc).count() == 0)
      assert(embOrc.exceptAll(emb).count() == 0)
      assert(evOrc.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      assert(evOrc.exceptAll(ev).count() == 0)
    } finally spark.conf.unset(Tables.SourceKey)
  }

  test("CsvSource: schema-pinned parity on flat tables; rejects nested") {
    val tmp = java.nio.file.Files.createTempDirectory("csv_src").toString
    val docs = Tables.load(spark, dir, "documents")
    docs.write.option("header", "true").csv(s"$tmp/documents.csv")
    val src = new CsvSource(Map(
      "documents" -> docs.schema,
      "embeddings" -> Tables.load(spark, dir, "embeddings").schema))
    Tables.registerProvider("csv", src)
    try {
      spark.conf.set(Tables.SourceKey, "csv")
      val viaCsv = Tables.load(spark, tmp, "documents")
        .select(col("doc_id"),
          graft.ops.TextAnalysis.qualityScore(col("text")).as("q"))
      spark.conf.unset(Tables.SourceKey)
      val viaParquet = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("q"))
      assert(viaCsv.schema == viaParquet.schema)
      assert(viaCsv.exceptAll(viaParquet).count() == 0)
      assert(viaParquet.exceptAll(viaCsv).count() == 0)
      // nested column (embeddings.embedding array<float>) fails fast
      val e = intercept[IllegalArgumentException] {
        src.table(spark, tmp, "embeddings")
      }
      assert(e.getMessage.contains("nested"))
      // missing schema fails fast, never infers
      val m = intercept[IllegalArgumentException] {
        src.table(spark, tmp, "orders")
      }
      assert(m.getMessage.contains("schema"))
    } finally spark.conf.unset(Tables.SourceKey)
  }
}
