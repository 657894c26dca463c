package graft.sources.es

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Executable Elasticsearch reader — a DataSource V2 implementation of
  * the reference's live entry point (`ed.DataFrame(es_client,
  * es_index_pattern)`, reference src/elastic_surv/dataset.py:260, and
  * its batch-paged cursor scan, dataset.py:189-225), built on nothing
  * but the PUBLIC ES REST contract (search + scroll + sliced scroll)
  * and JDK HTTP. Unlike the format-string adapter in
  * [[graft.core.ElasticsearchSource]] (which needs the external
  * elasticsearch-hadoop jar), this source is fully exercisable: the
  * spec drives it end-to-end against an in-process mock ES cluster,
  * and the identical wire protocol runs against a real one.
  *
  * Spark-first shape:
  *  - **partitions = ES slices**: `slices=N` plans N input partitions,
  *    each opening its own sliced scroll (`"slice":{"id":i,"max":N}`)
  *    — the distributed form of the reference's single cursor, so a
  *    1000-executor cluster scans one index in parallel;
  *  - **filter pushdown**: Catalyst filters translate to the ES query
  *    DSL (`term`/`terms`/`range`/`exists` under `bool.filter`,
  *    `And` nesting, `Or` as `bool.should` + `minimum_should_match`);
  *    untranslatable filters stay in Spark, and string term/terms/range
  *    filters are only pushed under `keywordStrings=true` (ES matches
  *    ANALYZED tokens on a text-mapped field — term equality AND range
  *    bounds alike — which would silently change results) —
  *    correctness never depends on the translation;
  *  - **projection pushdown**: the pruned column set becomes
  *    `_source`, so ES ships only the columns the plan reads;
  *  - **paging**: `scroll` (default, every ES version) pages a
  *    `size`-bounded scroll cursor (the reference's `batch_size`,
  *    dataset.py:148) freed on close; `pit` uses point-in-time +
  *    `search_after` over a `_shard_doc` sort — the ES 8 recommended
  *    deep-pagination path, snapshot-consistent, PIT freed on close.
  *
  * Options: `nodes` (base URL, e.g. `http://localhost:9200`), `index`,
  * `slices` (default 1), `batch` (page size, default 1000), `scroll`
  * (keep-alive, default `2m`), `paging` (`scroll`|`pit`),
  * `keywordStrings` (default false — set true only when every queried
  * string field is keyword-mapped, which unlocks `term`/`terms`/range
  * pushdown on strings). The read schema is caller-supplied
  * (`spark.read.schema(...)`) or inferred from `_mapping` —
  * long/int/double/float/boolean/string/timestamp_ntz columns;
  * `_source` fields absent in a hit read as null.
  */
final class EsScrollSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  /** Schema from `GET /{index}/_mapping` when the caller supplies
    * none. Field-type mapping follows the ES docs (`long`/`integer`/
    * `double`/`float`/`boolean`/`keyword`/`text`/`date`); anything
    * else — nested objects, custom-format dates beyond the contract
    * below — fails fast with the explicit-schema escape hatch rather
    * than silently widening dtypes.
    *
    * `date` fields read as [[TimestampNTZType]] carrying the UTC
    * wall-clock: ES stores dates as UTC instants, and `_source`
    * returns the value as indexed — this reader accepts epoch-millis
    * numbers and ISO-8601 strings (offset normalized to UTC; no
    * offset = already UTC). Indices using a custom non-ISO `format`
    * need an explicit StringType schema.
    *
    * When `index` is a pattern matching several concrete indices, the
    * per-index mappings are UNIONED; the same field mapped to two
    * different Spark types across indices fails fast (reading it as
    * either type would misparse the other index's rows).
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val nodes = Option(options.get("nodes")).getOrElse(
      throw new IllegalArgumentException("EsScrollSource: missing 'nodes'"))
    val index = Option(options.get("index")).getOrElse(
      throw new IllegalArgumentException("EsScrollSource: missing 'index'"))
    val http = EsScrollSource.httpClient()
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"$nodes/$index/_mapping"))
        .timeout(EsScrollSource.RequestTimeout).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"ES mapping ${resp.statusCode()}: ${resp.body().take(300)}")
    val root = new ObjectMapper().readTree(resp.body())
    // response shape: { "<concrete-index>": { "mappings": { "properties": {...}}}},
    // one top-level entry PER concrete index matched by the pattern
    val indexEntries = root.properties().iterator()
    if (!indexEntries.hasNext)
      throw new IllegalArgumentException(s"no mapping returned for '$index'")
    // field -> (spark type, first concrete index that declared it)
    val merged =
      scala.collection.mutable.LinkedHashMap.empty[String, (DataType, String)]
    while (indexEntries.hasNext) {
      val entry = indexEntries.next()
      val concreteIndex = entry.getKey
      val fields = entry.getValue.path("mappings").path("properties")
        .properties().iterator()
      while (fields.hasNext) {
        val e = fields.next()
        val dt = e.getValue.path("type").asText("") match {
          case "long" => LongType
          case "integer" | "short" | "byte" => IntegerType
          case "double" => DoubleType
          case "float" | "half_float" => FloatType
          case "boolean" => BooleanType
          case "keyword" | "text" => StringType
          case "date" =>
            // the reader's parse contract covers epoch-millis numbers
            // and ISO-8601 strings — exactly what the DEFAULT mapping
            // format (strict_date_optional_time||epoch_millis) emits.
            // A custom `format` (epoch_second, basic_date, joda
            // patterns, …) would be SILENTLY misparsed (e.g.
            // epoch_second read as millis = dates in 1970), so fail
            // fast on any format this reader cannot honor.
            val fmt = e.getValue.path("format").asText("")
            val ok = fmt.isEmpty || fmt.split("\\|\\|").map(_.trim).forall(
              Set("strict_date_optional_time", "date_optional_time",
                "strict_date_optional_time_nanos", "epoch_millis",
                "strict_date_time", "date_time", "strict_date",
                "date").contains)
            if (!ok) throw new UnsupportedOperationException(
              s"EsScrollSource cannot infer date field '${e.getKey}' with " +
                s"format '$fmt' (index '$concreteIndex') — only ISO-8601/" +
                "epoch_millis formats parse; pass an explicit " +
                "spark.read.schema(...) (e.g. StringType) instead")
            TimestampNTZType
          case other => throw new UnsupportedOperationException(
            s"EsScrollSource cannot infer field '${e.getKey}' of ES type " +
              s"'$other' (index '$concreteIndex') — pass an explicit " +
              "spark.read.schema(...)")
        }
        merged.get(e.getKey) match {
          case Some((prev, from)) if prev != dt =>
            throw new IllegalArgumentException(
              s"field '${e.getKey}' maps to $prev in index '$from' but $dt " +
                s"in index '$concreteIndex' — pattern '$index' spans " +
                "conflicting mappings; pass an explicit spark.read.schema(...)")
          case Some(_) => // same type — fine
          case None => merged += e.getKey -> (dt, concreteIndex)
        }
      }
    }
    require(merged.nonEmpty, s"index '$index' has an empty mapping")
    StructType(merged.map { case (n, (dt, _)) => StructField(n, dt) }
      .toSeq.sortBy(_.name))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new EsTable(schema)
}

private[es] object EsScrollSource {
  /** Bounded I/O: the JDK client's default is to wait FOREVER, so a
    * half-open connection or GC-frozen ES node would hang the Spark
    * task indefinitely — task-level retry never fires because the
    * task never fails. Bounded timeouts turn the hang into a loud
    * retryable failure. Request bound is generous: a deep scroll page
    * or large bulk body can legitimately take tens of seconds.
    */
  val ConnectTimeout: java.time.Duration = java.time.Duration.ofSeconds(10)
  val RequestTimeout: java.time.Duration = java.time.Duration.ofSeconds(120)
  def httpClient(): HttpClient =
    HttpClient.newBuilder().connectTimeout(ConnectTimeout).build()
  /** ISO-8601 → UTC wall-clock micros. With an offset the instant is
    * normalized to UTC; without one the value is taken as already-UTC
    * (ES's own convention for offset-less dates). Date-only values
    * ("2023-01-01" — legal under the default
    * strict_date_OPTIONAL_time) read as UTC midnight. Anything else
    * fails with the value in the message instead of an anonymous
    * parse exception killing the scan.
    */
  def parseIsoUtcMicros(s: String): Long = {
    val instant =
      try java.time.OffsetDateTime.parse(s).toInstant
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDateTime.parse(s)
            .toInstant(java.time.ZoneOffset.UTC)
          catch {
            case _: java.time.format.DateTimeParseException =>
              try java.time.LocalDate.parse(s).atStartOfDay()
                .toInstant(java.time.ZoneOffset.UTC)
              catch {
                case _: java.time.format.DateTimeParseException =>
                  throw new java.io.IOException(
                    s"EsScrollSource: unparseable date value '$s' — " +
                      "expected ISO-8601 (with/without offset/time) or " +
                      "epoch-millis; read the field as StringType via an " +
                      "explicit schema to handle custom formats")
              }
          }
      }
    Math.addExact(
      Math.multiplyExact(instant.getEpochSecond, 1000000L),
      instant.getNano / 1000L)
  }
}

private[es] final class EsTable(schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = "graft-es"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsScanBuilder(schema, options)
}

/** One pushed-down aggregate: `kind` is `star` (COUNT(*) → `_count` /
  * `track_total_hits`), `count` (COUNT(col) → `filter`+`exists` agg,
  * doc-count of documents carrying the field — Spark's non-null-row
  * count under this reader's scalar `_source` contract), `distinct`
  * (COUNT(DISTINCT col) → `cardinality` agg, exact up to
  * `precision_threshold` 40000 — the eland `nunique` parity path,
  * opt-in via `approxDistinct=true` because beyond the threshold ES
  * returns an approximation where Spark promises exactness), or
  * `min`/`max`. Extrema use TWO wire strategies keyed on `dt`:
  * FLOAT/DOUBLE fields go through the ES `min`/`max` metric aggs
  * (which return IEEE doubles, so fp extrema round-trip exactly),
  * while INT/LONG fields go through ONE size-1 sorted search
  * (`sort:[{f:order}], size:1, _source:[f]`) whose hit carries the
  * exact stored `_source` value — a metric agg's double payload would
  * silently drop bits on a long past 2^53. `sum`/`avg` stay
  * Spark-side on principle: ES accumulates them in doubles, whose
  * rounding depends on summation order. Counting aggs push only for
  * ATOMIC scalar columns — see `countable()`.
  * `dt` is the RESULT type tag: `long`, `int`, `double`, or `float`.
  */
private[es] final case class EsAggSpec(kind: String, field: String,
                                       dt: String = "long")

private[es] final class EsScanBuilder(fullSchema: StructType,
                                      options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggSpecs: Option[Seq[EsAggSpec]] = None
  private var groupBy: Seq[StructField] = Nil
  private val approxDistinct =
    Option(options.get("approxDistinct")).exists(_.toBoolean)
  // GROUP BY pushdown (composite agg) is exact, so it defaults ON for
  // groupable keys; the opt-out exists for the CARDINALITY tradeoff,
  // not correctness: the composite enumeration pages every group
  // through one reader, so when distinct groups approach the doc
  // count the sliced row scan + Spark's parallel shuffle agg is the
  // faster plan. Typical analytics (groups ≪ docs) wins server-side.
  private val groupedAggPushdown =
    Option(options.get("groupedAggPushdown")).forall(_.toBoolean)
  // String equality/In push down as ES `term`/`terms`, which match
  // ANALYZED tokens — on a text-mapped field that silently drops rows
  // (the probe filters server-side; Spark cannot resurrect them).
  // Safe only when the caller asserts string fields are keyword-mapped
  // via option keywordStrings=true; otherwise string term filters stay
  // entirely Spark-side. Range/exists/numeric/boolean semantics match
  // on every field type.
  private val keywordStrings =
    Option(options.get("keywordStrings")).exists(_.toBoolean)
  // Timestamp comparisons push as epoch-millis ranges (with an
  // explicit `"format":"epoch_millis"` so the MAPPING's format never
  // parses the bound) only under this assertion: ES `date` indexes at
  // MILLISECOND precision, so a document whose _source carries
  // sub-millisecond digits compares differently server-side (indexed
  // millis) than Spark-side (parsed micros) near boundaries. The
  // caller asserts the index stores ms-aligned times; additionally
  // only ms-aligned literal bounds push (a sub-ms bound cannot be
  // represented) — everything else stays Spark-side.
  private val dateMillisPushdown =
    Option(options.get("dateMillisPushdown")).exists(_.toBoolean)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(
      EsQuery.translatable(_, fullSchema, keywordStrings, dateMillisPushdown))
    pushed = sup
    unsup // Spark keeps evaluating these post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Count-shaped aggregates run server-side instead of a full
    * scroll — the reference's eland parity for the GLOBAL forms
    * (`len()` → `_count`, `nunique()` → `cardinality`,
    * dataset.py:64-68,83) and, BEYOND eland, exact GROUP BY pushdown
    * through the ES `composite` aggregation (terms sources paged by
    * `after_key` — exact and complete, unlike a plain `terms` agg
    * whose per-shard `size` truncation is approximate). Spark only
    * offers an aggregation for pushdown after ALL filters were pushed
    * (a post-scan filter blocks it in V2ScanRelationPushDown), so the
    * pushed query string is the complete predicate and the
    * server-side numbers are final.
    *
    * Grouping columns must be ATOMIC and doc-values-backed with an
    * unambiguous composite key wire form: int/long (composite returns
    * the exact JSON integer), float/double (IEEE round-trip),
    * keyword strings under the `keywordStrings` assertion (an
    * ANALYZED field would bucket per-token), and `date` under the
    * `dateMillisPushdown` assertion (composite keys come back as
    * epoch millis — exact only when the index stores ms-aligned
    * times, the same contract as date range pushdown). BooleanType
    * stays Spark-side: a terms source renders boolean keys as 0/1
    * numbers with a `key_as_string`, a wire shape this reader refuses
    * to guess at. Arrays/structs/maps never group (per-ELEMENT bucket
    * explosion vs Spark's whole-value grouping). Missing values form
    * a `missing_bucket: true` null-key bucket — Spark's GROUP BY
    * keeps null groups. Per-bucket aggregates: COUNT(*) →
    * `doc_count`, COUNT(col) → `value_count` (counts docs with a
    * value on a scalar field — Spark's null-skipping count),
    * COUNT(DISTINCT) → `cardinality` behind `approxDistinct`, and
    * float/double MIN/MAX → metric sub-aggs. Integral MIN/MAX keeps
    * the whole aggregation Spark-side: the global path's exact
    * size-1 sorted search has no per-bucket analogue short of one
    * HTTP call per group, and the metric agg's double payload drops
    * bits past 2^53.
    */
  private def translateAgg(agg: Aggregation)
      : Option[(Seq[StructField], Seq[EsAggSpec])] = {
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    val grouped = agg.groupByExpressions().nonEmpty
    def groupable(f: StructField): Boolean = f.dataType match {
      case IntegerType | LongType | FloatType | DoubleType => true
      case StringType => keywordStrings
      case TimestampNTZType => dateMillisPushdown
      case _ => false // boolean wire form, arrays/structs/maps: doc above
    }
    val groupFields: Seq[Option[StructField]] =
      agg.groupByExpressions().toSeq.map(e =>
        fieldOf(e).flatMap(c => fullSchema.fields.find(_.name == c))
          .filter(groupable))
    if (grouped &&
      (!groupedAggPushdown || groupFields.exists(_.isEmpty))) return None
    // counting aggs never parse field VALUES, so dates are safe; a
    // text-ANALYZED string field would make exists/cardinality operate
    // per-token-index semantics on some mappings — string fields need
    // the same keywordStrings assertion filters do. Non-atomic columns
    // never push: ES sees array fields per-ELEMENT, so `exists` is
    // false for a doc whose `_source` carries `[]`/`[null]` (nothing
    // indexed) while this reader materializes a non-null empty array
    // that Spark's COUNT(col) WOULD count, and `cardinality` counts
    // distinct elements where Spark counts distinct whole arrays —
    // both silently wrong under complete pushdown, so arrays (and any
    // other non-atomic type) stay on the row-scan path.
    def countable(c: String): Boolean =
      fullSchema.fields.find(_.name == c).exists(f => f.dataType match {
        case _: ArrayType | _: StructType | _: MapType => false
        case StringType => keywordStrings
        case _ => true
      })
    // min/max push for float/double (exact through ES's IEEE-double
    // metric-agg wire type) AND for int/long — the latter NOT via a
    // metric agg (whose double payload drops bits past 2^53) but via
    // a size-1 sorted search that reads the exact stored `_source`
    // value; the tag records which Spark type to emit back and which
    // wire strategy EsAggReader uses
    def extremumType(c: String): Option[String] =
      fullSchema.fields.find(_.name == c).map(_.dataType).collect {
        case DoubleType => "double"
        case FloatType => "float"
        case LongType => "long"
        case IntegerType => "int"
      }
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(EsAggSpec("star", ""))
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).filter(countable).map(EsAggSpec("count", _))
      case c: Count if c.isDistinct && approxDistinct =>
        fieldOf(c.column).filter(countable).map(EsAggSpec("distinct", _))
      case m: Min =>
        fieldOf(m.column).flatMap(f =>
          extremumType(f).filter(t =>
            !grouped || t == "double" || t == "float")
            .map(EsAggSpec("min", f, _)))
      case m: Max =>
        fieldOf(m.column).flatMap(f =>
          extremumType(f).filter(t =>
            !grouped || t == "double" || t == "float")
            .map(EsAggSpec("max", f, _)))
      case _ => None
    }
    if (specs.nonEmpty && specs.forall(_.isDefined))
      Some((groupFields.flatten, specs.flatten))
    else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translateAgg(agg) match {
      case Some((g, s)) => groupBy = g; aggSpecs = Some(s); true
      case None => false
    }

  override def build(): Scan = aggSpecs match {
    case Some(specs) if groupBy.nonEmpty => new EsGroupedAggScan(
      groupBy, specs, pushed,
      nodes = require("nodes"), index = require("index"),
      pageSize = Option(options.get("compositePageSize"))
        .map(_.toInt).getOrElse(1000))
    case Some(specs) => new EsAggScan(specs, pushed,
      nodes = require("nodes"), index = require("index"))
    case None => new EsScan(required, pushed,
      nodes = require("nodes"), index = require("index"),
      slices = Option(options.get("slices")).map(_.toInt).getOrElse(1),
      batch = Option(options.get("batch")).map(_.toInt).getOrElse(1000),
      scrollKeep = Option(options.get("scroll")).getOrElse("2m"),
      paging = Option(options.get("paging")).getOrElse("scroll") match {
        case p @ ("scroll" | "pit") => p
        case other => throw new IllegalArgumentException(
          s"EsScrollSource: paging must be 'scroll' or 'pit', got '$other'")
      })
  }

  private def require(k: String): String = {
    val v = options.get(k)
    if (v == null || v.isEmpty)
      throw new IllegalArgumentException(s"EsScrollSource: missing option '$k'")
    v
  }
}

private[es] final class EsScan(schema: StructType, filters: Array[Filter],
                               nodes: String, index: String, slices: Int,
                               batch: Int, scrollKeep: String, paging: String)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"EsScan(index=$index, slices=$slices, paging=$paging, " +
      s"query=${EsQuery.render(filters)})"

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(slices)(i => EsInputPartition(i, slices))

  /** PIT mode opens ONE point-in-time here on the DRIVER and ships its
    * id to every slice (ES 8 supports `slice` inside a PIT search
    * body), so all partitions read the SAME consistent snapshot — a
    * write racing the scan is either wholly visible or wholly not,
    * instead of landing between two slices' independent opens. The
    * shared PIT is freed by [[EsPitRegistry]] (JVM shutdown hook), and
    * the server reclaims it anyway once `keep_alive` lapses after the
    * last page — readers must NOT delete it (another slice may still
    * be paging; each search request extends the keep-alive). A task
    * scheduled more than `keep_alive` after the open fails loudly and
    * task-retries; raise the `scroll` option for long queue delays.
    */
  // memoized: Spark may materialize the reader factory more than once
  // for one scan (e.g. canonicalized plan copies under AQE); the scan's
  // snapshot must stay ONE PIT regardless. Corollary: RE-EXECUTING the
  // same DataFrame reuses this scan and therefore this snapshot — two
  // collects read the same point-in-time (consistent repeat reads); an
  // execution later than `scroll` keep-alive after the last page fails
  // loudly with the server's "PIT not found" and a re-read re-plans
  private lazy val sharedPit: String = {
    val resp = EsPitRegistry.post(
      s"$nodes/$index/_pit?keep_alive=$scrollKeep", "")
    val id = resp.path("id").asText(null)
    if (id == null)
      throw new java.io.IOException(s"ES _pit returned no id for $index")
    EsPitRegistry.register(nodes, id)
    id
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EsReaderFactory(schema.json, EsQuery.render(filters),
      schema.fieldNames, nodes, index, batch, scrollKeep, paging,
      if (paging == "pit") sharedPit else null)
}

/** Driver-side ledger of open shared PITs: freed eagerly on JVM
  * shutdown (best-effort — `keep_alive` expiry is the authoritative
  * server-side reclamation, per the ES docs' own PIT lifecycle).
  *
  * Known slack in the eager path: the ledger holds the id returned at
  * OPEN, while ES may rotate the id in each search response (readers
  * follow the rotation locally; ES documents that the most recent id
  * should be used). The shutdown DELETE can therefore target a stale
  * id and silently no-op, leaving the PIT to its keep-alive expiry —
  * acceptable because expiry is the authoritative cleanup and the
  * executors' rotated ids never travel back to the driver. If eager
  * cleanup ever matters for very long keep-alives, slices would need
  * to report rotated ids back through the commit path.
  */
private[es] object EsPitRegistry {
  private val open =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  private val mapper = new ObjectMapper()
  private lazy val hook: Unit = sys.addShutdownHook { freeAll() }

  def post(url: String, body: String): JsonNode =
    send("POST", url, body)

  private def send(method: String, url: String, body: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .timeout(EsScrollSource.RequestTimeout)
      .method(method,
        HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = EsScrollSource.httpClient()
      .send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"ES ${resp.statusCode()} from $url: ${resp.body().take(500)}")
    mapper.readTree(resp.body())
  }

  def register(nodes: String, pitId: String): Unit = {
    hook
    open.add((nodes, pitId))
  }

  /** Delete every registered PIT (shutdown hook; tests call directly). */
  def freeAll(): Unit = {
    var e = open.poll()
    while (e != null) {
      val (nodes, id) = e
      try {
        val body = mapper.createObjectNode()
        body.put("id", id)
        send("DELETE", s"$nodes/_pit", body.toString)
      } catch { case _: Exception => () } // expiry/unreachable is benign
      e = open.poll()
    }
  }
}

private[es] final case class EsInputPartition(sliceId: Int, sliceMax: Int)
    extends InputPartition

/** Completely-pushed global aggregation: ONE partition, ONE HTTP call,
  * ONE output row — `COUNT(*)` alone uses the `_count` endpoint (the
  * eland `len()` wire shape); any mix adds a `size=0` `_search` with
  * `track_total_hits` / `filter`+`exists` / `cardinality` aggs. The
  * scroll scan never runs: `df.count()` over a 10-TB index costs the
  * server one counting pass and the wire one JSON object.
  */
private[es] final class EsAggScan(specs: Seq[EsAggSpec],
                                  filters: Array[Filter],
                                  nodes: String, index: String)
    extends Scan with Batch {
  // positional contract: Spark aligns the i-th aggregate expression
  // with the i-th scan output column; counts are non-null longs,
  // min/max carry the column's own fp type and are NULL over an
  // empty match set (ES returns "value": null — exactly Spark's
  // Min/Max-of-nothing)
  override def readSchema(): StructType =
    StructType(specs.zipWithIndex.map { case (s, i) =>
      val (dt, nullable) = s.kind match {
        case "min" | "max" => (s.dt match {
          case "double" => DoubleType: DataType
          case "float" => FloatType: DataType
          case "int" => IntegerType: DataType
          case _ => LongType: DataType
        }, true)
        case _ => (LongType: DataType, false)
      }
      StructField(s"agg$i", dt, nullable)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"EsAggScan(index=$index, aggs=${specs.mkString(",")}, " +
      s"query=${EsQuery.render(filters)})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(EsInputPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new EsAggReaderFactory(
      specs.map(s => s.kind + ":" + s.dt + ":" + s.field).toArray,
      EsQuery.render(filters), nodes, index)
}

private[es] final class EsAggReaderFactory(specEnc: Array[String],
                                           queryJson: String,
                                           nodes: String, index: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EsAggReader(specEnc.map { s =>
      val a = s.indexOf(':'); val b = s.indexOf(':', a + 1)
      EsAggSpec(s.substring(0, a), s.substring(b + 1), s.substring(a + 1, b))
    }, queryJson, nodes, index)
}

private[es] final class EsAggReader(specs: Seq[EsAggSpec], queryJson: String,
                                    nodes: String, index: String)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private var done = false
  private var row: InternalRow = _

  private def post(url: String, body: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .timeout(EsScrollSource.RequestTimeout)
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = EsScrollSource.httpClient()
      .send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"ES ${resp.statusCode()} from $url: ${resp.body().take(500)}")
    mapper.readTree(resp.body())
  }

  /** Strict numeric extraction: a missing agg in the response must fail
    * loudly, not count 0 (the file's fail-fast contract).
    */
  private def longAt(n: JsonNode, what: String): Long = {
    if (!n.canConvertToLong) throw new java.io.IOException(
      s"EsAggScan: expected a count for $what, got '${n.toString.take(80)}'")
    n.asLong()
  }

  /** An integral extremum travels as a size-1 sorted search, never a
    * metric agg — the agg's double payload drops bits past 2^53.
    */
  private def sortedExtremum(s: EsAggSpec): Boolean =
    (s.kind == "min" || s.kind == "max") &&
      (s.dt == "long" || s.dt == "int")

  /** One HTTP call per integral extremum: sort ascending (min) or
    * descending (max) on the field, read the single hit's `_source` —
    * the exact stored JSON integer, bit-faithful past 2^53. Docs
    * missing the field sort `_last` (the ES default, pinned here), so
    * the first hit is the extremum over docs that HAVE a value —
    * exactly Spark's null-ignoring Min/Max; no hit at all (or a
    * valueless first hit) is the empty-set NULL.
    */
  private def fetchSortedExtremum(s: EsAggSpec, i: Int,
                                  out: GenericInternalRow): Unit = {
    val body = mapper.createObjectNode()
    body.put("size", 1)
    body.set[ObjectNode]("query",
      mapper.readTree(queryJson).asInstanceOf[ObjectNode])
    val sortField = body.putArray("sort").addObject().putObject(s.field)
    sortField.put("order", if (s.kind == "min") "asc" else "desc")
    sortField.put("missing", "_last")
    // Without this, a field with no mapping anywhere (explicit user
    // schema over an empty index, or an alias where some backing
    // indices lack the field) makes ES fail the whole search with 400
    // "No mapping found ... in order to sort on". unmapped_type makes
    // those shards sort every doc as missing (_last), so the valueless
    // first hit falls through to the NULL path below — Spark's
    // empty-set MIN/MAX semantics, matching the pre-pushdown plan.
    sortField.put("unmapped_type", if (s.dt == "int") "integer" else "long")
    body.putArray("_source").add(s.field)
    val resp = post(s"$nodes/$index/_search", body.toString)
    val hitsArr = resp.path("hits").path("hits")
    val v =
      if (!hitsArr.isArray || hitsArr.size() == 0)
        com.fasterxml.jackson.databind.node.NullNode.getInstance()
      else hitsArr.get(0).path("_source").path(s.field)
    if (v.isNull || v.isMissingNode) out.setNullAt(i)
    else if (!v.canConvertToLong ||
      (s.dt == "int" && !v.canConvertToInt))
      throw new java.io.IOException(
        s"EsAggScan: expected an exact ${s.dt} for ${s.kind}(${s.field}), " +
          s"got '${v.toString.take(80)}'")
    else if (s.dt == "int") out.setInt(i, v.asInt())
    else out.setLong(i, v.asLong())
  }

  override def next(): Boolean = {
    if (done) return false
    done = true
    val out = new GenericInternalRow(specs.length)
    val (viaSort, viaAggs) =
      specs.zipWithIndex.partition(p => sortedExtremum(p._1))
    if (viaAggs.map(_._1) == Seq(EsAggSpec("star", ""))) {
      val body = mapper.createObjectNode()
      body.set[ObjectNode]("query",
        mapper.readTree(queryJson).asInstanceOf[ObjectNode])
      val resp = post(s"$nodes/$index/_count", body.toString)
      out.setLong(viaAggs.head._2, longAt(resp.path("count"), "_count"))
    } else if (viaAggs.nonEmpty) {
      val body = mapper.createObjectNode()
      body.put("size", 0)
      body.set[ObjectNode]("query",
        mapper.readTree(queryJson).asInstanceOf[ObjectNode])
      if (viaAggs.exists(_._1.kind == "star"))
        body.put("track_total_hits", true)
      val aggs = body.putObject("aggs")
      viaAggs.foreach { case (s, i) =>
        s.kind match {
          case "star" => // served by hits.total, no sub-agg needed
          case "count" =>
            aggs.putObject(s"agg$i").putObject("filter")
              .putObject("exists").put("field", s.field)
          case "distinct" =>
            val c = aggs.putObject(s"agg$i").putObject("cardinality")
            c.put("field", s.field)
            c.put("precision_threshold", 40000)
          case k @ ("min" | "max") =>
            aggs.putObject(s"agg$i").putObject(k).put("field", s.field)
        }
      }
      val resp = post(s"$nodes/$index/_search", body.toString)
      viaAggs.foreach { case (s, i) =>
        s.kind match {
          case "star" =>
            val total = resp.path("hits").path("total")
            if (total.path("relation").asText("eq") != "eq")
              throw new java.io.IOException(
                "EsAggScan: hits.total is a lower bound " +
                  "(relation != eq) despite track_total_hits=true")
            out.setLong(i, longAt(total.path("value"), "hits.total"))
          case "count" =>
            out.setLong(i, longAt(resp.path("aggregations").path(s"agg$i")
              .path("doc_count"), s"count(${s.field})"))
          case "distinct" =>
            out.setLong(i, longAt(resp.path("aggregations").path(s"agg$i")
              .path("value"), s"cardinality(${s.field})"))
          case k @ ("min" | "max") =>
            val v = resp.path("aggregations").path(s"agg$i").path("value")
            if (v.isNull || v.isMissingNode) out.setNullAt(i)
            else if (!v.isNumber) throw new java.io.IOException(
              s"EsAggScan: expected a number for $k(${s.field}), " +
                s"got '${v.toString.take(80)}'")
            else if (s.dt == "float") out.setFloat(i, v.asDouble().toFloat)
            else out.setDouble(i, v.asDouble())
        }
      }
    }
    viaSort.foreach { case (s, i) => fetchSortedExtremum(s, i, out) }
    row = out
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Completely-pushed GROUP BY aggregation through the ES `composite`
  * aggregation: one partition pages the exact, totally-ordered bucket
  * enumeration with `after_key` (size-bounded requests, constant
  * reader memory), emitting one row per group — group-key columns
  * first, then the aggregates, Spark's positional contract for a
  * pushed grouped aggregation. Exactness is the point: a plain
  * `terms` agg truncates to its per-shard `size` and reports
  * `doc_count_error_upper_bound`; `composite` enumerates every bucket
  * exactly once. `missing_bucket: true` keeps Spark's null group.
  *
  * Scale shape: `GROUP BY lang` over a 10-TB index costs the server
  * one aggregation pass and the wire `groups/pageSize` JSON pages —
  * the scroll scan (10 TB of `_source`) never runs. The single-reader
  * enumeration is the right trade while groups ≪ docs; for key spaces
  * approaching the doc count, disable via `groupedAggPushdown=false`
  * and let the sliced scan + Spark shuffle agg parallelize.
  */
private[es] final class EsGroupedAggScan(groups: Seq[StructField],
                                         specs: Seq[EsAggSpec],
                                         filters: Array[Filter],
                                         nodes: String, index: String,
                                         pageSize: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    groups.map(g => StructField(g.name, g.dataType, nullable = true)) ++
      specs.zipWithIndex.map { case (s, i) =>
        val (dt, nullable) = s.kind match {
          case "min" | "max" => (s.dt match {
            case "float" => FloatType: DataType
            case _ => DoubleType: DataType
          }, true)
          case _ => (LongType: DataType, false)
        }
        StructField(s"agg$i", dt, nullable)
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"EsGroupedAggScan(index=$index, groupBy=${groups.map(_.name).mkString(",")}, " +
      s"aggs=${specs.mkString(",")}, query=${EsQuery.render(filters)})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(EsInputPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new EsGroupedAggReaderFactory(
      StructType(groups).json,
      specs.map(s => s.kind + ":" + s.dt + ":" + s.field).toArray,
      EsQuery.render(filters), nodes, index, pageSize)
}

private[es] final class EsGroupedAggReaderFactory(groupsJson: String,
                                                  specEnc: Array[String],
                                                  queryJson: String,
                                                  nodes: String, index: String,
                                                  pageSize: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EsGroupedAggReader(
      DataType.fromJson(groupsJson).asInstanceOf[StructType],
      specEnc.map { s =>
        val a = s.indexOf(':'); val b = s.indexOf(':', a + 1)
        EsAggSpec(s.substring(0, a), s.substring(b + 1), s.substring(a + 1, b))
      }, queryJson, nodes, index, pageSize)
}

private[es] final class EsGroupedAggReader(groups: StructType,
                                           specs: Seq[EsAggSpec],
                                           queryJson: String,
                                           nodes: String, index: String,
                                           pageSize: Int)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private var buffer: Iterator[InternalRow] = Iterator.empty
  private var afterKey: JsonNode = _
  private var exhausted = false
  private var row: InternalRow = _

  private def post(url: String, body: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .timeout(EsScrollSource.RequestTimeout)
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = EsScrollSource.httpClient()
      .send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"ES ${resp.statusCode()} from $url: ${resp.body().take(500)}")
    mapper.readTree(resp.body())
  }

  private def requestBody(): String = {
    val body = mapper.createObjectNode()
    body.put("size", 0)
    body.set[ObjectNode]("query",
      mapper.readTree(queryJson).asInstanceOf[ObjectNode])
    val comp = body.putObject("aggs").putObject("groups")
    val compSpec = comp.putObject("composite")
    compSpec.put("size", pageSize)
    val sources = compSpec.putArray("sources")
    groups.fields.foreach { g =>
      val terms = sources.addObject().putObject(g.name).putObject("terms")
      terms.put("field", g.name)
      terms.put("missing_bucket", true) // Spark GROUP BY keeps null groups
    }
    if (afterKey != null) compSpec.set[ObjectNode]("after", afterKey)
    val subs = comp.putObject("aggs")
    specs.zipWithIndex.foreach { case (s, i) =>
      s.kind match {
        case "star" => // every bucket carries doc_count
        case "count" =>
          subs.putObject(s"agg$i").putObject("value_count")
            .put("field", s.field)
        case "distinct" =>
          val c = subs.putObject(s"agg$i").putObject("cardinality")
          c.put("field", s.field)
          c.put("precision_threshold", 40000)
        case k @ ("min" | "max") =>
          subs.putObject(s"agg$i").putObject(k).put("field", s.field)
      }
    }
    body.toString
  }

  private def longAt(n: JsonNode, what: String): Long = {
    if (!n.canConvertToLong)
      throw new java.io.IOException(
        s"EsGroupedAggScan: expected an integral $what, " +
          s"got '${n.toString.take(80)}'")
    n.asLong()
  }

  private def setGroupKey(out: GenericInternalRow, i: Int,
                          f: StructField, v: JsonNode): Unit = {
    if (v == null || v.isNull || v.isMissingNode) { out.setNullAt(i); return }
    f.dataType match {
      case LongType => out.setLong(i, longAt(v, s"key ${f.name}"))
      case IntegerType =>
        if (!v.canConvertToInt) throw new java.io.IOException(
          s"EsGroupedAggScan: int key ${f.name} out of range: $v")
        out.setInt(i, v.asInt())
      case DoubleType => out.setDouble(i, v.asDouble())
      case FloatType => out.setFloat(i, v.asDouble().toFloat)
      case StringType => out.update(i, UTF8String.fromString(v.asText()))
      case TimestampNTZType =>
        // composite date keys travel as epoch millis; exact under the
        // dateMillisPushdown assertion that gates date grouping
        out.setLong(i, math.multiplyExact(longAt(v, s"key ${f.name}"), 1000L))
      case other => throw new java.io.IOException(
        s"EsGroupedAggScan: unsupported group key type $other")
    }
  }

  private def fetchPage(): Unit = {
    val resp = post(s"$nodes/$index/_search", requestBody())
    val agg = resp.path("aggregations").path("groups")
    val buckets = agg.path("buckets")
    if (!buckets.isArray)
      throw new java.io.IOException(
        s"EsGroupedAggScan: no composite buckets in response: " +
          resp.toString.take(200))
    val n = buckets.size()
    val rows = (0 until n).iterator.map { b =>
      val bucket = buckets.get(b)
      val out = new GenericInternalRow(groups.length + specs.length)
      val key = bucket.path("key")
      groups.fields.zipWithIndex.foreach { case (f, i) =>
        setGroupKey(out, i, f, key.path(f.name))
      }
      specs.zipWithIndex.foreach { case (s, i) =>
        val j = groups.length + i
        s.kind match {
          case "star" =>
            out.setLong(j, longAt(bucket.path("doc_count"), "doc_count"))
          case "count" =>
            out.setLong(j, longAt(bucket.path(s"agg$i").path("value"),
              s"value_count(${s.field})"))
          case "distinct" =>
            out.setLong(j, longAt(bucket.path(s"agg$i").path("value"),
              s"cardinality(${s.field})"))
          case k @ ("min" | "max") =>
            val v = bucket.path(s"agg$i").path("value")
            if (v.isNull || v.isMissingNode) out.setNullAt(j)
            else if (!v.isNumber) throw new java.io.IOException(
              s"EsGroupedAggScan: expected a number for $k(${s.field}), " +
                s"got '${v.toString.take(80)}'")
            else if (s.dt == "float") out.setFloat(j, v.asDouble().toFloat)
            else out.setDouble(j, v.asDouble())
        }
      }
      out: InternalRow
    }.toVector
    buffer = rows.iterator
    val ak = agg.path("after_key")
    // a short page is the end of the enumeration; ES echoes after_key
    // for every non-empty page, so paging stops on size, not presence
    if (n < pageSize || ak.isMissingNode || ak.isNull) exhausted = true
    else afterKey = ak
  }

  override def next(): Boolean = {
    while (!buffer.hasNext && !exhausted) fetchPage()
    if (buffer.hasNext) { row = buffer.next(); true } else false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Everything a reader task needs, in serializable primitives; the
  * schema travels as its JSON form.
  */
private[es] final class EsReaderFactory(schemaJson: String, queryJson: String,
                                        sourceFields: Array[String],
                                        nodes: String, index: String,
                                        batch: Int, scrollKeep: String,
                                        paging: String, sharedPitId: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ep = p.asInstanceOf[EsInputPartition]
    new EsPartitionReader(
      DataType.fromJson(schemaJson).asInstanceOf[StructType], queryJson,
      sourceFields, nodes, index, batch, scrollKeep, paging, sharedPitId,
      ep.sliceId, ep.sliceMax)
  }
}

/** One sliced cursor: open on first `next()`, page on demand, free the
  * server-side context on close. Pure JDK HttpClient — no client
  * library. Two paging modes:
  *  - `scroll` (default): classic scroll cursor, works on every ES;
  *  - `pit`: `search_after` over a `_shard_doc` sort inside the ONE
  *    point-in-time the driver opened (`EsScan.createReaderFactory`) —
  *    the ES 8 recommended deep-pagination path (scroll is deprecated
  *    for it). Every slice pages the SAME snapshot (`slice` inside the
  *    PIT body), so the whole scan is globally consistent; the shared
  *    PIT outlives any one reader and is freed by [[EsPitRegistry]] /
  *    server-side keep-alive expiry, never by a reader's `close()`.
  */
private[es] final class EsPartitionReader(schema: StructType, queryJson: String,
                                          sourceFields: Array[String],
                                          nodes: String, index: String,
                                          batch: Int, scrollKeep: String,
                                          paging: String, sharedPitId: String,
                                          sliceId: Int, sliceMax: Int)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val http = EsScrollSource.httpClient()
  private val usePit = paging == "pit"
  private var scrollId: String = _
  private var pitId: String = _
  private var lastSort: ArrayNode = _
  private var hits: java.util.Iterator[JsonNode] = _
  private var row: InternalRow = _
  private var opened = false
  private var exhausted = false

  private def send(method: String, url: String, body: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .timeout(EsScrollSource.RequestTimeout)
      .method(method,
        HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"ES ${resp.statusCode()} from $url: ${resp.body().take(500)}")
    mapper.readTree(resp.body())
  }

  private def post(url: String, body: String): JsonNode =
    send("POST", url, body)

  /** size + query + _source + slice — shared by both paging modes. */
  private def searchBody(): ObjectNode = {
    val body = mapper.createObjectNode()
    body.put("size", batch)
    body.set[ObjectNode]("query",
      mapper.readTree(queryJson).asInstanceOf[ObjectNode])
    val src = body.putArray("_source")
    sourceFields.foreach(src.add)
    if (sliceMax > 1) {
      val slice = body.putObject("slice")
      slice.put("id", sliceId)
      slice.put("max", sliceMax)
    }
    body
  }

  private def open(): Unit = {
    if (usePit) {
      // the driver opened ONE PIT for the whole scan; this slice just
      // pages inside it (its id may still rotate per-response locally)
      pitId = sharedPitId
      consume(post(s"$nodes/_search", pitBody(after = null).toString))
    } else {
      consume(post(s"$nodes/$index/_search?scroll=$scrollKeep",
        searchBody().toString))
    }
    opened = true
  }

  /** PIT search body: the PIT carries the index (so the URL is bare
    * `/_search`), `_shard_doc` is the documented cheapest total order,
    * and `search_after` resumes past the previous page's last sort key.
    */
  private def pitBody(after: ArrayNode): ObjectNode = {
    val body = searchBody()
    val pit = body.putObject("pit")
    pit.put("id", pitId)
    pit.put("keep_alive", scrollKeep)
    body.putArray("sort").addObject().put("_shard_doc", "asc")
    body.put("track_total_hits", false)
    if (after != null) body.set[ObjectNode]("search_after", after)
    body
  }

  private def consume(page: JsonNode): Unit = {
    if (usePit) {
      // the server may rotate the PIT id between pages
      val newPit = page.path("pit_id").asText(null)
      if (newPit != null) pitId = newPit
    } else {
      scrollId = page.path("_scroll_id").asText(null)
    }
    val arr = page.path("hits").path("hits")
    if (arr.isArray && arr.size() > 0) {
      if (usePit) arr.get(arr.size() - 1).path("sort") match {
        case a: ArrayNode => lastSort = a
        case _ => throw new java.io.IOException(
          "ES PIT hit missing its sort key — cannot page with search_after")
      }
      hits = arr.elements()
    } else { exhausted = true; hits = java.util.Collections.emptyIterator() }
  }

  private def nextPage(): Unit = {
    if (usePit) {
      if (lastSort == null) { exhausted = true; return }
      consume(post(s"$nodes/_search", pitBody(after = lastSort).toString))
    } else if (scrollId == null) { exhausted = true } else {
      val body = mapper.createObjectNode()
      body.put("scroll", scrollKeep)
      body.put("scroll_id", scrollId)
      consume(post(s"$nodes/_search/scroll", body.toString))
    }
  }

  override def next(): Boolean = {
    if (!opened) open()
    while (!hits.hasNext && !exhausted) nextPage()
    if (!hits.hasNext) return false
    row = convert(hits.next().path("_source"))
    true
  }

  override def get(): InternalRow = row

  private def convert(src: JsonNode): InternalRow = {
    val out = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v = src.path(f.name)
      // strict _source typing: ES allows ANY field to hold an array
      // (or a differently-typed value) with no mapping signal, and
      // Jackson's asLong/asText on a container return silent defaults
      // (0 / "" / false) — fail with the field and value instead of
      // emitting wrong rows (the file's fail-fast contract)
      def bad(dt: DataType): Nothing = throw new java.io.IOException(
        s"EsScrollSource: _source field '${f.name}' holds " +
          s"${v.getNodeType} '${v.toString.take(80)}' but the schema " +
          s"expects ${dt.simpleString} — declare multi-valued fields " +
          s"as ArrayType via an explicit spark.read.schema(...) " +
          "(ES mappings carry no array signal)")
      // element-level conversion shared by the scalar and array paths
      def scalar(dt: DataType, v: JsonNode): Any = dt match {
        case LongType =>
          if (!v.canConvertToLong) bad(dt); v.asLong()
        case IntegerType =>
          if (!v.canConvertToInt) bad(dt); v.asInt()
        case DoubleType =>
          if (!v.isNumber) bad(dt); v.asDouble()
        case FloatType =>
          if (!v.isNumber) bad(dt); v.asDouble().toFloat
        case BooleanType =>
          if (!v.isBoolean) bad(dt); v.asBoolean()
        case StringType =>
          if (v.isContainerNode) bad(dt)
          UTF8String.fromString(v.asText())
        case TimestampNTZType =>
          // ES `date` contract (see inferSchema): epoch-millis number
          // or ISO-8601 string; exposed as the UTC wall-clock in NTZ
          // micros so results are session-timezone-independent.
          if (!v.isNumber && !v.isTextual) bad(dt)
          if (v.isNumber) Math.multiplyExact(v.asLong(), 1000L)
          else EsScrollSource.parseIsoUtcMicros(v.asText())
        case dt => throw new UnsupportedOperationException(
          s"EsScrollSource: unsupported dtype $dt for column ${f.name}")
      }
      if (v.isMissingNode || v.isNull) out.setNullAt(i)
      else f.dataType match {
        // ES's own data model: EVERY field is zero-or-more values, and
        // a scalar in one doc can be an array in the next. Under an
        // explicit ArrayType schema both wire shapes read as arrays
        // (scalar = the documented ES shorthand for a 1-element array);
        // JSON nulls inside the array stay null elements.
        case ArrayType(elem, _) =>
          val vals: Array[Any] =
            if (v.isArray) Array.tabulate(v.size()) { j =>
              val e = v.get(j)
              if (e.isNull) null else scalar(elem, e)
            }
            else Array(scalar(elem, v))
          out.update(i, new GenericArrayData(vals))
        case dt => out.update(i, scalar(dt, v))
      }
      i += 1
    }
    out
  }

  override def close(): Unit = {
    // PIT mode: the snapshot is SHARED across slices — deleting it here
    // would kill the scan for every slice still paging; EsPitRegistry
    // (driver) and server-side keep-alive expiry own its lifecycle.
    try {
      if (!usePit && scrollId != null) {
        val body = mapper.createObjectNode()
        body.put("scroll_id", scrollId)
        send("DELETE", s"$nodes/_search/scroll", body.toString)
      }
    } catch { case _: Exception => () } // cursor expiry races are benign
  }
}

/** [[graft.core.SourceProvider]] over [[EsScrollSource]] — the seam
  * registration that makes `spark.conf.set("graft.source", "es-rest")`
  * route every `Tables.load` through the live scroll reader. `dir`
  * plays the reference's index-prefix role (`es_index_pattern`);
  * per-table read schemas are explicit for the same dtype-fidelity
  * reason the CSV/JSONL providers require them.
  */
final class EsRestSource(nodes: String,
                         schemas: Map[String, StructType] = Map.empty,
                         options: Map[String, String] = Map.empty)
    extends graft.core.SourceProvider {
  def indexFor(dir: String, name: String): String =
    graft.core.SourceProvider.esIndexFor(dir, name)
  def table(spark: org.apache.spark.sql.SparkSession, dir: String,
            name: String): org.apache.spark.sql.DataFrame = {
    val reader = spark.read
    // explicit schema pins dtypes; otherwise the source infers from
    // GET /{index}/_mapping (columns come back name-sorted)
    schemas.get(name).foreach(reader.schema)
    reader.format(classOf[EsScrollSource].getName)
      .options(options ++ Map("nodes" -> nodes,
        "index" -> indexFor(dir, name)))
      .load()
  }
}

/** Catalyst `Filter` → ES query DSL. Only translates what the DSL
  * expresses exactly (term/terms/range/exists); everything else stays
  * a Spark-side filter, so the translation can only REDUCE bytes off
  * the wire, never change results.
  */
private[es] object EsQuery {
  private val mapper = new ObjectMapper()

  def translatable(f: Filter, schema: StructType,
                   keywordStrings: Boolean,
                   dateMillis: Boolean = false): Boolean = {
    def colType(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)
    def stringCol(c: String): Boolean = colType(c).contains(StringType)
    // ArrayType columns never push ANY filter: ES matches per ELEMENT
    // (`term` is true if any element equals; `exists` is false for a
    // doc whose _source carries []/[null] even though the reader
    // materializes a non-null array Spark would keep) — and a pushed
    // filter is dropped from Spark's post-scan re-evaluation, so the
    // divergence would be silent. Also true for any other non-atomic
    // type the schema might declare.
    def atomicCol(c: String): Boolean = colType(c).exists {
      case _: ArrayType | _: StructType | _: MapType => false
      case _ => true
    }
    // Timestamp columns push value comparisons only under the
    // dateMillisPushdown assertion (EsScanBuilder doc) and only for
    // ms-aligned literal bounds — rendered as epoch-millis ranges
    // with an explicit `"format":"epoch_millis"`, so the mapping's
    // own format never parses them.
    def tsCol(c: String): Boolean =
      colType(c).exists(t => t == TimestampNTZType || t == TimestampType)
    // term/terms/range on a text-ANALYZED field match individual
    // lowercased tokens, not the whole value Spark compares — and
    // because a pushed filter is dropped from Spark's post-scan
    // re-evaluation, that is silently wrong. Push string comparisons
    // only when the caller asserts keyword mapping.
    def valueComparable(c: String, v: Any): Boolean =
      atomicCol(c) &&
        (if (tsCol(c)) dateMillis && tsEpochMillisAligned(v).isDefined
         else keywordStrings || !stringCol(c))
    f match {
      // `term: null` is an ES 400 (whole-scan failure); leave it Spark-side
      case EqualTo(c, v) => v != null && valueComparable(c, v)
      case In(c, vs) =>
        // ES rejects null inside a terms array (400 → whole-query
        // failure), and term matching on analyzed text drops rows;
        // date Ins stay Spark-side (term on a date parses per MAPPING
        // format — no per-query format override exists for terms)
        !vs.contains(null) && !tsCol(c) && valueComparable(c, null)
      case GreaterThan(c, v) => v != null && valueComparable(c, v)
      case GreaterThanOrEqual(c, v) => v != null && valueComparable(c, v)
      case LessThan(c, v) => v != null && valueComparable(c, v)
      case LessThanOrEqual(c, v) => v != null && valueComparable(c, v)
      case IsNotNull(c) => atomicCol(c)
      case IsNull(c) => atomicCol(c)
      case And(l, r) => translatable(l, schema, keywordStrings, dateMillis) &&
        translatable(r, schema, keywordStrings, dateMillis)
      case Or(l, r) => translatable(l, schema, keywordStrings, dateMillis) &&
        translatable(r, schema, keywordStrings, dateMillis)
      case _ => false
    }
  }

  /** Epoch millis of a pushed timestamp literal, defined ONLY when the
    * value is exactly millisecond-aligned (a sub-ms bound cannot be
    * expressed to a ms-precision ES `date` index). LocalDateTime (the
    * TimestampNTZ literal class) is taken as UTC wall-clock — the
    * reader's own NTZ contract.
    */
  private[es] def tsEpochMillisAligned(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      if (t.getNanos % 1000000 == 0) Some(t.getTime) else None
    case d: java.time.LocalDateTime =>
      val i = d.toInstant(java.time.ZoneOffset.UTC)
      if (i.getNano % 1000000 == 0) Some(i.toEpochMilli) else None
    case i: java.time.Instant =>
      if (i.getNano % 1000000 == 0) Some(i.toEpochMilli) else None
    case _ => None
  }

  def render(filters: Array[Filter]): String =
    if (filters.isEmpty) """{"match_all":{}}"""
    else {
      val root = mapper.createObjectNode()
      val filterArr = root.putObject("bool").putArray("filter")
      filters.foreach(f => filterArr.add(node(f)))
      root.toString
    }

  private def scalar(target: ObjectNode, key: String, v: Any): Unit = v match {
    case null => target.putNull(key)
    case b: Boolean => target.put(key, b)
    case i: Int => target.put(key, i)
    case l: Long => target.put(key, l)
    case f: Float => target.put(key, f)
    case d: Double => target.put(key, d)
    case other => target.put(key, other.toString)
  }

  private def scalarInto(arr: ArrayNode, v: Any): Unit = v match {
    case null => arr.addNull()
    case b: Boolean => arr.add(b)
    case i: Int => arr.add(i)
    case l: Long => arr.add(l)
    case f: Float => arr.add(f)
    case d: Double => arr.add(d)
    case other => arr.add(other.toString)
  }

  /** Range bound with timestamp awareness: an (aligned) timestamp
    * value renders as epoch millis plus the explicit
    * `"format":"epoch_millis"` override, so the index mapping's own
    * date format never parses the bound.
    */
  private def rangeBound(target: ObjectNode, key: String, v: Any): Unit =
    tsEpochMillisAligned(v) match {
      case Some(ms) =>
        target.put(key, ms)
        target.put("format", "epoch_millis")
      case None => scalar(target, key, v)
    }

  private def node(f: Filter): ObjectNode = {
    val n = mapper.createObjectNode()
    f match {
      // date equality renders as a closed range (term queries parse
      // per MAPPING format — no per-query override exists for them)
      case EqualTo(c, v) if tsEpochMillisAligned(v).isDefined =>
        val r = n.putObject("range").putObject(c)
        val ms = tsEpochMillisAligned(v).get
        r.put("gte", ms); r.put("lte", ms)
        r.put("format", "epoch_millis")
      case EqualTo(c, v) => scalar(n.putObject("term"), c, v)
      case In(c, vs) =>
        val arr = n.putObject("terms").putArray(c)
        vs.foreach(scalarInto(arr, _))
      case GreaterThan(c, v) =>
        rangeBound(n.putObject("range").putObject(c), "gt", v)
      case GreaterThanOrEqual(c, v) =>
        rangeBound(n.putObject("range").putObject(c), "gte", v)
      case LessThan(c, v) =>
        rangeBound(n.putObject("range").putObject(c), "lt", v)
      case LessThanOrEqual(c, v) =>
        rangeBound(n.putObject("range").putObject(c), "lte", v)
      case IsNotNull(c) => n.putObject("exists").put("field", c)
      case IsNull(c) =>
        n.putObject("bool").putObject("must_not")
          .putObject("exists").put("field", c)
      case And(l, r) =>
        val arr = n.putObject("bool").putArray("filter")
        arr.add(node(l)); arr.add(node(r))
      case Or(l, r) =>
        // disjunction = bool.should with minimum_should_match:1 (the
        // default of 1 only applies when there is no sibling filter/
        // must clause, so state it explicitly)
        val b = n.putObject("bool")
        val arr = b.putArray("should")
        arr.add(node(l)); arr.add(node(r))
        b.put("minimum_should_match", 1)
      case other =>
        throw new IllegalArgumentException(s"untranslatable filter $other")
    }
    n
  }
}
