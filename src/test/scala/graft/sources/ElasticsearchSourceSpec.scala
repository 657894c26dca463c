package graft.sources

import graft.SparkTestBase
import graft.core.{ElasticsearchSource, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The es-shaped provider: registry selection, index naming, and the
  * reader plumbing (format + options + load-by-index-name). The real
  * `org.elasticsearch.spark.sql` DataSource needs a jar and a live
  * cluster this sandbox doesn't have, so the plumbing is proven two
  * ways: (1) dispatch with the REAL format string must fail inside
  * Spark's DataSource lookup FOR that format — proving conf-keyed
  * selection routed the load there; (2) the identical provider with
  * the format swapped to parquet round-trips actual data through the
  * index-name mapping.
  */
class ElasticsearchSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("index mapping: dir is the index prefix") {
    val src = new ElasticsearchSource(Map("es.nodes" -> "localhost"))
    assert(src.indexFor("surv", "documents") == "surv_documents")
    assert(src.indexFor("", "documents") == "documents")
    assert(src.indexFor(null, "documents") == "documents")
  }

  test("conf-keyed selection dispatches to the es provider") {
    Tables.registerProvider("es",
      new ElasticsearchSource(Map("es.nodes" -> "localhost", "es.port" -> "9200")))
    try {
      spark.conf.set(Tables.SourceKey, "es")
      val err = intercept[Exception] {
        Tables.load(spark, "surv", "documents").schema
      }
      // the failure must come from Spark resolving the ES DataSource —
      // i.e. the load reached format("org.elasticsearch.spark.sql")
      def mentions(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("elasticsearch")) ||
          mentions(t.getCause))
      assert(mentions(err), s"unexpected failure path: $err")
    } finally spark.conf.unset(Tables.SourceKey)
  }

  test("reader plumbing round-trips with the format swapped to parquet") {
    val base = java.nio.file.Files.createTempDirectory("es_shape").toString
    val parquetDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // the provider maps (dir=prefix, name) -> "<prefix>_<name>"
    parquetDocs.write.mode("overwrite").parquet(s"$base/pfx_documents")
    Tables.registerProvider("es_parquet_shape",
      new ElasticsearchSource(Map.empty, format = "parquet"))
    try {
      spark.conf.set(Tables.SourceKey, "es_parquet_shape")
      val viaEsShape = Tables.load(spark, s"$base/pfx", "documents")
      assert(viaEsShape.schema == parquetDocs.schema)
      assert(viaEsShape.count() == parquetDocs.count())
    } finally spark.conf.unset(Tables.SourceKey)
  }
}
