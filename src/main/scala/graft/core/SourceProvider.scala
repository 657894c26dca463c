package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable table source — the engine-side seam for the reference's
  * live ElasticSearch scan (reference: src/elastic_surv/dataset.py:260,
  * the eland-backed `ESDataset`). Everything downstream consumes plain
  * DataFrames, so a connector only has to produce the named table as a
  * DataFrame; filters/projections written against the result push down
  * through whatever DataSource V2 relation the provider returns.
  *
  * Implementations:
  *   - [[ParquetSource]] (default): one parquet file per table under a
  *     scale-factor directory (`TESTDATA.md` layout), `dir` = the
  *     directory path.
  *   - [[graft.sources.es.EsRestSource]]: the EXECUTABLE DataSource V2
  *     ES reader (`EsScrollSource` — sliced scroll / shared-PIT
  *     paging, DSL + projection + global-aggregate pushdown),
  *     mock-cluster-tested end-to-end; `dir` = the index prefix.
  *   - [[ElasticsearchSource]] (below): the elasticsearch-hadoop
  *     adapter shape — compile-only here (the external jar and a live
  *     cluster are unavailable in this zero-egress sandbox).
  */
trait SourceProvider {
  /** Load table `name` scoped by `dir` (directory, index prefix, …). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame
}

object SourceProvider {
  /** The one dir/name → ES index rule (the reference's
    * `es_index_pattern` prefix role) — shared by every ES-shaped
    * provider so the same `graft.source` conf swap always reads the
    * same indices regardless of which connector serves it.
    */
  def esIndexFor(dir: String, name: String): String =
    if (dir == null || dir.isEmpty) name else s"${dir}_$name"
}

/** Default provider over the driver testdata parquet layout. */
object ParquetSource extends SourceProvider {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** ElasticSearch-shaped provider — the connector shape the reference's
  * live scan would use (reference: src/elastic_surv/dataset.py:260,
  * `ed.DataFrame(es_client, es_index_pattern)`): the public
  * elasticsearch-hadoop Spark integration exposes indices as a
  * DataSource (`spark.read.format("org.elasticsearch.spark.sql")`),
  * through which Catalyst pushes projections and filters down into the
  * ES query DSL — the same pushdown eland performs for the reference.
  *
  * `dir` plays the index-PREFIX role (the reference's
  * `es_index_pattern`), so the provider maps table `name` under prefix
  * `dir` to index `dir_name` (empty prefix ⇒ index = name); `options`
  * carries the connection settings (`es.nodes`, `es.port`,
  * `es.net.http.auth.*`, …) straight into the reader.
  *
  * COMPILE-ONLY in this sandbox: the elasticsearch-hadoop jar and a
  * live cluster are unavailable (zero egress), so `table()` is
  * exercised only by provider-selection tests that never call it
  * against a real index. Everything up to the `format(...)` load — the
  * registry, conf-keyed selection, option plumbing, index naming — is
  * the real connector surface.
  */
final class ElasticsearchSource(
    options: Map[String, String],
    format: String = "org.elasticsearch.spark.sql")
    extends SourceProvider {
  def indexFor(dir: String, name: String): String =
    SourceProvider.esIndexFor(dir, name)
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.format(format).options(options).load(indexFor(dir, name))
}

/** JSON-lines provider — a second REAL implementation of the seam
  * (one `<name>.jsonl` file per table under `dir`), proving a
  * connector needs nothing beyond `table()`. An explicit schema is
  * required for engine parity: JSON inference widens ints to bigint
  * and loses float32, so the provider reads with the schema the
  * parquet layout declares (pass it per table via `schemas`, e.g.
  * copied from the parquet files once at setup).
  */
final class JsonlSource(
    schemas: Map[String, org.apache.spark.sql.types.StructType])
    extends SourceProvider {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val reader = spark.read
    schemas.get(name).foreach(reader.schema)
    reader.json(s"$dir/$name.jsonl")
  }
}

/** ORC provider — the columnar alternative to parquet (`<name>.orc`
  * directory per table). Full-fidelity for every engine type (nested
  * arrays, timestamps, decimals), with the same predicate/column
  * pushdown surface parquet gets: the V2 OrcScan reports
  * `PushedFilters` and a pruned `ReadSchema` exactly like the parquet
  * scan the PlanSpec contracts pin.
  */
object OrcSource extends SourceProvider {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.orc(s"$dir/$name.orc")
}

/** CSV provider (`<name>.csv` directory per table, headered). An
  * explicit schema is required for engine parity (inference reads
  * everything permissively and widens numerics); timestamps round-trip
  * through the default ISO format. CSV's flat text model cannot carry
  * array/struct columns (the `embeddings` table) — a connector for
  * those tables must pick a richer format; `table()` fails fast on a
  * schema with nested types rather than silently corrupting.
  */
final class CsvSource(
    schemas: Map[String, org.apache.spark.sql.types.StructType])
    extends SourceProvider {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val schema = schemas.getOrElse(name, throw new IllegalArgumentException(
      s"CsvSource needs an explicit schema for table '$name'"))
    require(schema.fields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }), s"CSV cannot represent nested columns of table '$name'")
    spark.read.schema(schema).option("header", "true")
      .csv(s"$dir/$name.csv")
  }
}
