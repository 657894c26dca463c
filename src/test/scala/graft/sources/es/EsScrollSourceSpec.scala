package graft.sources.es

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end exercise of the ES scroll DataSource against an
  * in-process mock cluster speaking the real wire protocol (search +
  * sliced scroll + scroll continuation + cursor delete). What the
  * format-string adapter could only claim, this spec executes: row
  * round-trips, query-DSL filter pushdown (asserted on the CAPTURED
  * request bodies, not just the Spark plan), `_source` projection
  * pushdown, slice-parallel scans, and the provider-seam routing.
  */
class EsScrollSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val mapper = new ObjectMapper()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("score", DoubleType),
    StructField("flagged", BooleanType)))

  // 25 canned docs: lang cycles en/de/fr, score = i/10, flagged on 5s
  private val docs: Seq[(Long, String, Double, Boolean)] =
    (0 until 25).map(i =>
      (i.toLong, Seq("en", "de", "fr")(i % 3), i / 10.0, i % 5 == 0))

  /** Mock ES: serves its document store (seeded with `initial`) with
    * real scroll/slice semantics, accepts `_bulk` NDJSON writes, and
    * records every search body + bulk request + scroll-cursor delete.
    */
  private final class MockEs(initial: Seq[(Long, String, Double, Boolean)]) {
    def this() = this(docs)
    private val store =
      new java.util.concurrent.CopyOnWriteArrayList[(Long, String, Double, Boolean)](
        initial.asJava)
    def stored: Seq[(Long, String, Double, Boolean)] = store.asScala.toSeq
    val bulks = new AtomicInteger(0)
    val searches = new ConcurrentLinkedQueue[JsonNode]()
    val deletes = new AtomicInteger(0)
    val scrollCalls = new AtomicInteger(0)
    val pits = new AtomicInteger(0)
    val pitDeletes = new AtomicInteger(0)
    val counts = new AtomicInteger(0)
    val bulkBodies = new ConcurrentLinkedQueue[String]()
    // when set, that doc's score is served as an ARRAY (legal ES!)
    @volatile var multiValueDocId: Option[Long] = None
    // when set, that doc's score is served as an EMPTY array — ES
    // indexes no value for it (exists=false) while an ArrayType read
    // materializes a non-null [] that Spark's COUNT(col) counts
    @volatile var emptyArrayDocId: Option[Long] = None
    // when set, that doc has NO lang value (field absent): composite
    // missing_bucket semantics get a real missing key to group
    @volatile var nullLangDocId: Option[Long] = None
    // scroll_id -> (remaining rows, page size)
    private val cursors =
      new java.util.concurrent.ConcurrentHashMap[String, (List[Int], Int)]()
    private val nextId = new AtomicInteger(0)

    /** Typed field access (composite grouping + exists): null when the
      * doc has no value for the field. `created` is the indexed epoch
      * millis as a Long — the wire type composite date keys travel as.
      */
    private def fieldValue(i: Int, name: String): Any = {
      val (id, lang, score, flagged) = store.get(i)
      name match {
        case "doc_id" => id
        case "lang" => if (nullLangDocId.contains(id)) null else lang
        case "score" => score
        case "flagged" => flagged
        case "created" => dateBase + id * 1000
      }
    }

    private def evalQuery(q: JsonNode, i: Int): Boolean = {
      def field(name: String): Any = fieldValue(i, name) match {
        case l: Long if name == "created" => l.toDouble // range cmp path
        case v => v
      }
      if (q.has("match_all")) true
      else if (q.has("term")) {
        val f = q.get("term").properties().asScala.head
        val v = field(f.getKey)
        v != null && v.toString == f.getValue.asText()
      } else if (q.has("terms")) {
        val f = q.get("terms").properties().asScala.head
        val v = field(f.getKey)
        v != null && f.getValue.elements().asScala.exists(x =>
          v.toString == x.asText())
      } else if (q.has("range")) {
        val f = q.get("range").properties().asScala.head
        field(f.getKey) match {
          case s: String => // keyword fields range lexically in ES
            f.getValue.properties().asScala.forall { b =>
              val bound = b.getValue.asText()
              b.getKey match {
                case "gt" => s > bound
                case "gte" => s >= bound
                case "lt" => s < bound
                case "lte" => s <= bound
              }
            }
          case num =>
            val v = num.asInstanceOf[Double]
            f.getValue.properties().asScala.forall { b =>
              val bound = b.getValue.asDouble()
              b.getKey match {
                case "gt" => v > bound
                case "gte" => v >= bound
                case "lt" => v < bound
                case "lte" => v <= bound
                case "format" => true // bound-parsing directive, not a bound
              }
            }
        }
      } else if (q.has("exists"))
        field(q.get("exists").get("field").asText()) != null
      else if (q.has("bool")) {
        val b = q.get("bool")
        val must = !b.has("filter") ||
          b.get("filter").elements().asScala.forall(evalQuery(_, i))
        val mustNot = !b.has("must_not") ||
          !evalQuery(b.get("must_not"), i)
        val should = !b.has("should") ||
          b.get("should").elements().asScala.exists(evalQuery(_, i))
        must && mustNot && should
      } else sys.error(s"mock cannot evaluate: $q")
    }

    // date fixture: created(i) = base + id seconds; even ids serve the
    // epoch-millis wire form, odd ids the ISO-8601 one — both are
    // legal `_source` shapes for an ES `date` field
    val dateBase = 1700000000000L
    private def hitSource(src: com.fasterxml.jackson.databind.node.ObjectNode,
                          i: Int): Unit = {
      val (id, lang, score, flagged) = store.get(i)
      src.put("doc_id", id)
      if (!nullLangDocId.contains(id)) src.put("lang", lang)
      if (emptyArrayDocId.contains(id)) src.putArray("score")
      else if (multiValueDocId.contains(id)) {
        val arr = src.putArray("score"); arr.add(score); arr.add(score + 1)
      } else src.put("score", score)
      src.put("flagged", flagged)
      if (id % 2 == 0) src.put("created", dateBase + id * 1000)
      else src.put("created",
        java.time.Instant.ofEpochMilli(dateBase + id * 1000).toString)
    }

    private def page(key: String): String = {
      val (rows, size) = cursors.get(key)
      val (now, later) = rows.splitAt(size)
      cursors.put(key, (later, size))
      val resp = mapper.createObjectNode()
      resp.put("_scroll_id", key)
      val hitsArr = resp.putObject("hits").putArray("hits")
      now.foreach(i => hitSource(hitsArr.addObject().putObject("_source"), i))
      resp.toString
    }

    /** Composite-agg semantics per the public contract: group matching
      * docs by the terms-source key tuple (a doc with a missing key on
      * a source WITHOUT missing_bucket is dropped; WITH it, the null
      * key forms its own bucket, ordered first under asc), order
      * buckets by key, resume strictly after `after`, emit at most
      * `size` buckets plus the last key as `after_key`, and serve the
      * per-bucket sub-aggs (value_count / cardinality / min / max).
      */
    private def serveComposite(name: String, spec: JsonNode,
                               query: JsonNode): String = {
      val comp = spec.get("composite")
      val size = comp.path("size").asInt(10)
      val sources = comp.get("sources").elements().asScala.toSeq.map { s =>
        val e = s.properties().asScala.head
        val terms = e.getValue.get("terms")
        (e.getKey, terms.get("field").asText(),
          terms.path("missing_bucket").asBoolean(false))
      }
      val matching = (0 until store.size).filter(i => evalQuery(query, i))
      def keyOf(i: Int): Option[Seq[Any]] = {
        val vs = sources.map { case (_, f, mb) => (fieldValue(i, f), mb) }
        if (vs.exists(v => v._1 == null && !v._2)) None
        else Some(vs.map(_._1))
      }
      def cmpOne(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x: String, y: String) => x.compareTo(y)
        case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
        case other => sys.error(s"mock cannot order key pair $other")
      }
      def cmp(a: Seq[Any], b: Seq[Any]): Int =
        a.zip(b).iterator.map { case (x, y) => cmpOne(x, y) }
          .find(_ != 0).getOrElse(0)
      val ordered = matching.flatMap(i => keyOf(i).map(_ -> i))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
        .sortWith((l, r) => cmp(l._1, r._1) < 0)
      val after: Option[Seq[Any]] =
        if (!comp.has("after")) None
        else Some(sources.map { case (n, f, _) =>
          val v = comp.get("after").get(n)
          if (v == null || v.isNull) null
          else f match {
            case "doc_id" | "created" => v.asLong(): Any
            case "score" => v.asDouble(): Any
            case "lang" => v.asText(): Any
            case "flagged" => v.asBoolean(): Any
          }
        })
      val page = ordered
        .dropWhile(b => after.exists(a => cmp(b._1, a) <= 0))
        .take(size)
      val resp = mapper.createObjectNode()
      val aggOut = resp.putObject("aggregations").putObject(name)
      def putVal(node: com.fasterxml.jackson.databind.node.ObjectNode,
                 fname: String, v: Any): Unit = v match {
        case null => node.putNull(fname)
        case x: Long => node.put(fname, x); ()
        case x: Double => node.put(fname, x); ()
        case x: String => node.put(fname, x); ()
        case x: Boolean => node.put(fname, x); ()
      }
      val bucketsArr = aggOut.putArray("buckets")
      page.foreach { case (key, rows) =>
        val b = bucketsArr.addObject()
        val keyNode = b.putObject("key")
        sources.zip(key).foreach { case ((n, _, _), v) =>
          putVal(keyNode, n, v) }
        b.put("doc_count", rows.size)
        spec.path("aggs").properties().asScala.foreach { sub =>
          val sname = sub.getKey; val sspec = sub.getValue
          if (sspec.has("value_count")) {
            val f = sspec.get("value_count").get("field").asText()
            b.putObject(sname).put("value",
              rows.count(fieldValue(_, f) != null))
          } else if (sspec.has("cardinality")) {
            val f = sspec.get("cardinality").get("field").asText()
            b.putObject(sname).put("value",
              rows.map(fieldValue(_, f)).filter(_ != null).toSet.size)
          } else if (sspec.has("min") || sspec.has("max")) {
            val isMin = sspec.has("min")
            val f = sspec.get(if (isMin) "min" else "max")
              .get("field").asText()
            val vs = rows.map(fieldValue(_, f)).collect { case d: Double => d }
            val node = b.putObject(sname)
            if (vs.isEmpty) node.putNull("value")
            else node.put("value", if (isMin) vs.min else vs.max)
          } else sys.error(s"mock cannot serve bucket agg: $sspec")
        }
      }
      if (page.nonEmpty) {
        val akNode = aggOut.putObject("after_key")
        sources.zip(page.last._1).foreach { case ((n, _, _), v) =>
          putVal(akNode, n, v) }
      }
      resp.toString
    }

    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val out: String =
        if (path == "/_search/scroll" && ex.getRequestMethod == "DELETE") {
          deletes.incrementAndGet(); """{"succeeded":true}"""
        } else if (path == "/_search/scroll") {
          scrollCalls.incrementAndGet()
          page(mapper.readTree(body).get("scroll_id").asText())
        } else if (path == "/_pit" && ex.getRequestMethod == "DELETE") {
          pitDeletes.incrementAndGet()
          """{"succeeded":true,"num_freed":1}"""
        } else if (path.endsWith("/_pit")) {
          s"""{"id":"pit-${pits.incrementAndGet()}"}"""
        } else if (path == "/m2/_mapping") {
          // pattern spanning two indices with compatible (union-able)
          // mappings
          """{"m2-a":{"mappings":{"properties":{
            "doc_id":{"type":"long"},"lang":{"type":"keyword"}}}},
            "m2-b":{"mappings":{"properties":{
            "doc_id":{"type":"long"},"score":{"type":"double"}}}}}"""
            .replaceAll("\\s+", "")
        } else if (path == "/mdate/_mapping") {
          // a custom date format the reader's parse contract cannot
          // honor — inferSchema must refuse, not misparse
          """{"mdate":{"mappings":{"properties":{
            "ts":{"type":"date","format":"epoch_second"}}}}}"""
            .replaceAll("\\s+", "")
        } else if (path == "/mbad/_mapping") {
          // same field, conflicting types across the matched indices
          """{"mbad-a":{"mappings":{"properties":{
            "doc_id":{"type":"long"}}}},
            "mbad-b":{"mappings":{"properties":{
            "doc_id":{"type":"keyword"}}}}}"""
            .replaceAll("\\s+", "")
        } else if (path.endsWith("/_mapping")) {
          """{"docs":{"mappings":{"properties":{
            "doc_id":{"type":"long"},"lang":{"type":"keyword"},
            "score":{"type":"double"},"flagged":{"type":"boolean"},
            "created":{"type":"date"}}}}}"""
            .replaceAll("\\s+", "")
        } else if (path.endsWith("/_count")) {
          counts.incrementAndGet()
          val q = mapper.readTree(body).get("query")
          val n = (0 until store.size).count(evalQuery(q, _))
          s"""{"count":$n}"""
        } else if (path.endsWith("/_bulk")) {
          bulks.incrementAndGet()
          bulkBodies.add(body)
          body.linesIterator.filter(_.nonEmpty).grouped(2).foreach { pair =>
            val doc = mapper.readTree(pair(1))
            // only docs matching the 4-field scalar fixture enter the
            // store; other shapes (e.g. array round-trip bodies) are
            // captured in bulkBodies for wire-shape assertions
            if (doc.hasNonNull("lang") && doc.path("score").isNumber)
              store.add((doc.get("doc_id").asLong(), doc.get("lang").asText(),
                doc.get("score").asDouble(), doc.get("flagged").asBoolean()))
          }
          """{"errors":false,"items":[]}"""
        } else if (path.endsWith("/_search")) {
          val req = mapper.readTree(body)
          searches.add(req)
          val size = req.path("size").asInt(1000)
          val aggEntries =
            if (req.has("aggs")) req.get("aggs").properties().asScala.toSeq
            else Nil
          if (aggEntries.size == 1 && aggEntries.head.getValue.has("composite")) {
            // composite aggregation: exact, totally-ordered bucket
            // enumeration paged by after_key; missing_bucket admits
            // null-key groups (sorted first, the asc default)
            serveComposite(aggEntries.head.getKey, aggEntries.head.getValue,
              req.get("query"))
          } else if (req.has("aggs")) {
            // server-side aggregation request (size=0): track_total_hits
            // → exact hits.total; filter+exists → doc_count;
            // cardinality → exact distinct count (fixture < threshold)
            val matching = (0 until store.size)
              .filter(i => evalQuery(req.get("query"), i))
            val resp = mapper.createObjectNode()
            if (req.path("track_total_hits").asBoolean(false)) {
              val t = resp.putObject("hits").putObject("total")
              t.put("value", matching.size); t.put("relation", "eq")
            } else resp.putObject("hits").putArray("hits")
            val aggsOut = resp.putObject("aggregations")
            req.get("aggs").properties().asScala.foreach { e =>
              val spec = e.getValue
              if (spec.has("filter")) {
                // fixture has no absent fields: exists matches all
                aggsOut.putObject(e.getKey).put("doc_count", matching.size)
              } else if (spec.has("cardinality")) {
                val f = spec.get("cardinality").get("field").asText()
                val distinct = matching.map { i =>
                  val (id, lang, score, flagged) = store.get(i)
                  f match {
                    case "doc_id" => id.toString
                    case "lang" => lang
                    case "score" => score.toString
                    case "flagged" => flagged.toString
                  }
                }.toSet.size
                aggsOut.putObject(e.getKey).put("value", distinct)
              } else if (spec.has("min") || spec.has("max")) {
                val isMin = spec.has("min")
                val f = spec.get(if (isMin) "min" else "max")
                  .get("field").asText()
                require(f == "score", s"mock min/max only serves score, got $f")
                val vs = matching.map(i => store.get(i)._3)
                val node = aggsOut.putObject(e.getKey)
                if (vs.isEmpty) node.putNull("value")
                else node.put("value", if (isMin) vs.min else vs.max)
              } else sys.error(s"mock cannot serve agg: $spec")
            }
            resp.toString
          } else {
          val (sid, smax) =
            if (req.has("slice"))
              (req.get("slice").get("id").asInt(),
                req.get("slice").get("max").asInt())
            else (0, 1)
          if (req.has("pit")) {
            // PIT + search_after: sort key = store row index (the
            // mock's `_shard_doc`), page resumes strictly after it
            val after =
              if (req.has("search_after"))
                req.get("search_after").get(0).asInt()
              else -1
            val rows = (0 until store.size)
              .filter(_ % smax == sid)
              .filter(_ > after)
              .filter(i => evalQuery(req.get("query"), i))
              .take(size)
            val resp = mapper.createObjectNode()
            resp.put("pit_id", req.get("pit").get("id").asText())
            val hitsArr = resp.putObject("hits").putArray("hits")
            rows.foreach { i =>
              val h = hitsArr.addObject()
              hitSource(h.putObject("_source"), i)
              h.putArray("sort").add(i)
            }
            resp.toString
          } else if (req.has("sort")) {
            // size-1 sorted search (integral-extremum pushdown): order
            // matching rows by the sort field — longs compared AS
            // longs, never through a double — and honor `_source`
            val sortSpec = req.get("sort").get(0)
            val fname = sortSpec.fieldNames().next()
            val asc = sortSpec.get(fname).get("order").asText() == "asc"
            val matching = (0 until store.size)
              .filter(i => evalQuery(req.get("query"), i))
            val ordered = fname match {
              case "doc_id" => matching.sortBy(i => store.get(i)._1)
              case "score" => matching.sortBy(i => store.get(i)._3)
              case other => sys.error(s"mock cannot sort on $other")
            }
            val top = (if (asc) ordered else ordered.reverse).take(size)
            val wanted = req.get("_source").elements().asScala
              .map(_.asText()).toSet
            val resp = mapper.createObjectNode()
            val hitsArr = resp.putObject("hits").putArray("hits")
            top.foreach { i =>
              val (id, lang, score, flagged) = store.get(i)
              val src = hitsArr.addObject().putObject("_source")
              if (wanted("doc_id")) src.put("doc_id", id)
              if (wanted("lang")) src.put("lang", lang)
              if (wanted("score")) src.put("score", score)
              if (wanted("flagged")) src.put("flagged", flagged)
            }
            resp.toString
          } else {
            val rows = (0 until store.size)
              .filter(_ % smax == sid)
              .filter(i => evalQuery(req.get("query"), i)).toList
            val key = s"scroll-${nextId.incrementAndGet()}"
            cursors.put(key, (rows, size))
            page(key)
          }
          }
        } else sys.error(s"unexpected ${ex.getRequestMethod} $path")
      val bytes = out.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def read(es: MockEs, extra: (String, String)*) =
    spark.read.schema(schema)
      .format(classOf[EsScrollSource].getName)
      .option("nodes", es.url).option("index", "docs")
      .options(extra.toMap)
      .load()

  test("sliced scroll round-trips every row across pages and slices") {
    val es = new MockEs
    try {
      val got = read(es, "slices" -> "3", "batch" -> "4")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2), r.getBoolean(3))).toSet
      assert(got == docs.toSet)
      // three sliced searches, each paging a 4-row scroll window
      val slices = es.searches.asScala.map(s =>
        (s.get("slice").get("id").asInt(), s.get("slice").get("max").asInt()))
      assert(slices.toSet == Set((0, 3), (1, 3), (2, 3)))
      assert(es.scrollCalls.get() > 0, "never paged the scroll")
      assert(es.deletes.get() == 3, "scroll cursors not freed")
    } finally es.stop()
  }

  test("filters translate to the query DSL and prune rows server-side") {
    val es = new MockEs
    try {
      // keywordStrings: the mock's lang is keyword-shaped (exact terms)
      val df = read(es, "keywordStrings" -> "true")
        .filter(col("lang") === "en" && col("score") > 0.5)
        .select(col("doc_id"))
      val got = df.collect().map(_.getLong(0)).toSet
      val want = docs.filter(d => d._2 == "en" && d._3 > 0.5)
        .map(_._1).toSet
      assert(got == want && want.nonEmpty)
      val sent = es.searches.asScala.head.toString
      assert(sent.contains("\"term\":{\"lang\":\"en\"}"), sent)
      assert(sent.contains("\"range\":{\"score\":{\"gt\":0.5}}"), sent)
      // projection pushdown: _source carries only the read columns
      val src = es.searches.asScala.head.get("_source")
        .elements().asScala.map(_.asText()).toSet
      assert(src.subsetOf(Set("doc_id", "lang", "score")), src.toString)
      assert(!src.contains("flagged"), "unused column fetched")
      // and the scan itself reports the pushed query in its description
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }
      assert(scans.exists(d => d.contains("\"term\":{\"lang\":\"en\"}")),
        s"pushed query missing from scan description: $scans")
    } finally es.stop()
  }

  test("untranslatable filters stay Spark-side; results still exact") {
    val es = new MockEs
    try {
      val got = read(es).filter(col("lang").contains("e")) // no DSL form
        .collect().map(_.getLong(0)).toSet
      val want = docs.filter(_._2.contains("e")).map(_._1).toSet
      assert(got == want && want.nonEmpty)
      val sent = es.searches.asScala.head.get("query").toString
      assert(!sent.contains("contains"), sent)
    } finally es.stop()
  }

  test("string term filters stay Spark-side unless keywordStrings is set") {
    val es = new MockEs
    try {
      // without the option: ES term on an analyzed text field would
      // match tokens, not values — so the filter must NOT be pushed
      val got = read(es).filter(col("lang") === "en")
        .collect().map(_.getLong(0)).toSet
      assert(got == docs.filter(_._2 == "en").map(_._1).toSet)
      val sent = es.searches.asScala.head.get("query").toString
      assert(!sent.contains("term"), s"string term pushed unsafely: $sent")
      // an In containing null is never pushed (ES 400s on null terms)
      es.searches.clear()
      val got2 = read(es, "keywordStrings" -> "true")
        .filter(col("lang").isin("en", null))
        .collect().map(_.getLong(0)).toSet
      assert(got2 == docs.filter(_._2 == "en").map(_._1).toSet)
      val sent2 = es.searches.asScala.head.get("query").toString
      assert(!sent2.contains("null"), s"null leaked into terms: $sent2")
    } finally es.stop()
  }

  test("provider seam routes Tables.load through the scroll reader") {
    val es = new MockEs
    try {
      graft.core.Tables.registerProvider("es-rest",
        new EsRestSource(es.url, Map("docs" -> schema)))
      spark.conf.set(graft.core.Tables.SourceKey, "es-rest")
      try {
        val got = graft.core.Tables.load(spark, "", "docs").count()
        assert(got == docs.length)
      } finally spark.conf.unset(graft.core.Tables.SourceKey)
      // prefix mapping mirrors the reference's es_index_pattern
      assert(new EsRestSource(es.url, Map.empty)
        .indexFor("surv", "documents") == "surv_documents")
    } finally es.stop()
  }

  test("bulk sink round-trips: distributed write then scroll read") {
    import spark.implicits._
    val es = new MockEs(Seq.empty) // empty index
    try {
      val out = docs.toDF("doc_id", "lang", "score", "flagged")
        .repartition(3)
      EsBulkSink.write(out, es.url, "docs",
        idCol = Some("doc_id"), batch = 4)
      assert(es.stored.toSet == docs.toSet)
      assert(es.bulks.get() >= 7, // 25 rows / 4 per body, over 3 tasks
        s"expected batched bulk bodies, saw ${es.bulks.get()}")
      val back = read(es).collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getBoolean(3))).toSet
      assert(back == docs.toSet)
    } finally es.stop()
  }

  test("schema inference from _mapping round-trips without a user schema") {
    val es = new MockEs
    try {
      val df = spark.read
        .format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "docs")
        .load()
      assert(df.schema.fieldNames.toSeq ==
        Seq("created", "doc_id", "flagged", "lang", "score"))
      assert(df.schema("doc_id").dataType == LongType &&
        df.schema("lang").dataType == StringType &&
        df.schema("score").dataType == DoubleType &&
        df.schema("flagged").dataType == BooleanType &&
        df.schema("created").dataType == TimestampNTZType)
      assert(df.count() == docs.length)
    } finally es.stop()
  }

  test("ES date fields parse both wire forms to the UTC wall-clock NTZ") {
    val es = new MockEs
    try {
      // inferred schema (created: TimestampNTZ); fixture serves even
      // ids as epoch-millis numbers and odd ids as ISO-8601 strings
      val got = spark.read.format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "docs").load()
        .select(col("doc_id"), col("created"))
        .collect()
        .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1))
        .toMap
      assert(got.size == docs.length)
      docs.foreach { case (id, _, _, _) =>
        val want = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(es.dateBase + id * 1000),
          java.time.ZoneOffset.UTC)
        assert(got(id) == want, s"doc $id")
      }
    } finally es.stop()
  }

  test("PIT + search_after pages every row across slices inside ONE " +
    "shared snapshot") {
    val es = new MockEs
    try {
      EsPitRegistry.freeAll() // drain leftovers from other tests
      val before = es.pitDeletes.get()
      val got = read(es, "paging" -> "pit", "slices" -> "2", "batch" -> "4")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2), r.getBoolean(3))).toSet
      assert(got == docs.toSet)
      // the driver opens ONE PIT for the whole scan; both slices page
      // inside it — a single globally-consistent snapshot
      assert(es.pits.get() == 1, "expected one shared PIT for the scan")
      val bodies = es.searches.asScala.toSeq
      assert(bodies.forall(b =>
        b.get("pit").get("id").asText() == "pit-1"),
        "slices did not share the driver's PIT id")
      assert(bodies.map(b => b.get("slice").get("id").asInt()).toSet ==
        Set(0, 1), "both slices should page inside the PIT")
      // readers must NOT delete the shared PIT (another slice may still
      // be paging); the driver-side registry frees it
      assert(es.pitDeletes.get() == before, "a reader deleted the shared PIT")
      EsPitRegistry.freeAll()
      assert(es.pitDeletes.get() == before + 1, "registry did not free the PIT")
      assert(es.scrollCalls.get() == 0 && es.deletes.get() == 0,
        "PIT mode must not touch the scroll API")
      assert(bodies.forall(b =>
        b.get("sort").get(0).has("_shard_doc")), "missing _shard_doc sort")
      assert(bodies.exists(_.has("search_after")),
        "never paged via search_after")
    } finally es.stop()
  }

  test("COUNT(*) pushes down to the _count endpoint — no scroll, no hits") {
    val es = new MockEs
    try {
      val cdf = read(es).filter(col("score") > 0.5).groupBy().count()
      assert(cdf.collect().head.getLong(0) == docs.count(_._3 > 0.5))
      assert(es.counts.get() == 1, "expected exactly one _count call")
      assert(es.searches.asScala.isEmpty && es.scrollCalls.get() == 0,
        "count(*) must not open a search/scroll")
      // the agg scan replaces the row scan in the executed plan; the
      // pushed filter rides along in the _count body (served
      // server-side: the mock evaluated it to produce the number)
      val plan = cdf.queryExecution.executedPlan.toString
      assert(plan.contains("EsAggScan"), plan.take(2000))
    } finally es.stop()
  }

  test("COUNT(DISTINCT col) pushes as a cardinality agg under " +
    "approxDistinct; stays Spark-side otherwise") {
    val es = new MockEs
    try {
      val got = read(es, "approxDistinct" -> "true", "keywordStrings" -> "true")
        .agg(countDistinct(col("lang")), count(lit(1))).collect().head
      assert(got.getLong(0) == 3 && got.getLong(1) == docs.size)
      val aggReq = es.searches.asScala.find(_.has("aggs"))
      assert(aggReq.isDefined, "no aggs request sent")
      val sent = aggReq.get.toString
      assert(sent.contains("\"cardinality\""), sent)
      assert(sent.contains("\"precision_threshold\":40000"), sent)
      assert(aggReq.get.path("size").asInt(-1) == 0, sent)
      assert(es.scrollCalls.get() == 0, "agg pushdown still scrolled")
      // without the opt-in, distinct-count computes Spark-side (exact
      // semantics preserved): full scan, no cardinality agg
      es.searches.clear()
      val exact = read(es).agg(countDistinct(col("lang"))).collect().head
      assert(exact.getLong(0) == 3)
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "cardinality pushed without approxDistinct=true")
    } finally es.stop()
  }

  test("timestamp ranges push as epoch_millis ranges under " +
    "dateMillisPushdown; sub-ms bounds and date Ins stay Spark-side") {
    val es = new MockEs
    try {
      // inferred schema: created is TimestampNTZ (UTC wall-clock)
      def df(extra: (String, String)*) = spark.read
        .format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "docs")
        .options(extra.toMap).load()
      val cut = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(es.dateBase + 10000),
        java.time.ZoneOffset.UTC)
      val want = docs.filter(_._1 >= 10).map(_._1).toSet
      val got = df("dateMillisPushdown" -> "true")
        .filter(col("created") >= lit(cut))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want && want.nonEmpty && want.size < docs.size)
      val sent = es.searches.asScala.head.toString
      assert(sent.contains("\"format\":\"epoch_millis\""), sent)
      assert(sent.contains(s"\"gte\":${es.dateBase + 10000}"), sent)
      // equality renders as a closed range (term parses per mapping)
      es.searches.clear()
      val one = df("dateMillisPushdown" -> "true")
        .filter(col("created") === lit(cut))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(one == Seq(10L))
      val sentEq = es.searches.asScala.head.toString
      assert(sentEq.contains("\"lte\"") && sentEq.contains("\"gte\"") &&
        !sentEq.contains("\"term\":{\"created\""), sentEq)
      // a sub-millisecond bound cannot express itself to a ms-precision
      // index: stays Spark-side, results still exact
      es.searches.clear()
      val gotSub = df("dateMillisPushdown" -> "true")
        .filter(col("created") >= lit(cut.plusNanos(500000)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(gotSub == docs.filter(_._1 >= 11).map(_._1).toSet)
      assert(!es.searches.asScala.head.get("query").toString
        .contains("epoch_millis"), "sub-ms bound was pushed")
      // without the option, timestamp comparisons never push
      es.searches.clear()
      val gotOff = df().filter(col("created") >= lit(cut))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(gotOff == want)
      // IsNotNull still pushes as `exists` (always safe); the VALUE
      // comparison must not
      assert(!es.searches.asScala.head.get("query").toString
        .contains("\"range\":{\"created\""),
        "date range pushed without the assertion")
    } finally es.stop()
  }

  test("MIN/MAX on fp fields push as ES metric aggs; empty match " +
    "returns NULL; long min/max pushes as a size-1 sorted search") {
    val es = new MockEs
    try {
      // keywordStrings: the lang filter must push or the post-scan
      // filter blocks aggregate pushdown entirely
      val got = read(es, "keywordStrings" -> "true")
        .filter(col("lang") === "de")
        .agg(min(col("score")), max(col("score")), count(lit(1)))
        .collect().head
      val want = docs.filter(_._2 == "de").map(_._3)
      assert(got.getDouble(0) == want.min && got.getDouble(1) == want.max)
      assert(got.getLong(2) == want.size)
      val sent = es.searches.asScala.find(_.has("aggs"))
      assert(sent.isDefined, "no aggs request sent")
      assert(sent.get.toString.contains("\"min\":{\"field\":\"score\"}"),
        sent.get.toString)
      assert(es.scrollCalls.get() == 0, "min/max pushdown still scrolled")
      // empty match set (numeric filter — pushable without options):
      // ES serves value:null, Spark reads a NULL min
      es.searches.clear()
      val empty = read(es).filter(col("score") > 1000.0)
        .agg(min(col("score"))).collect().head
      assert(empty.isNullAt(0), "min over zero rows must be NULL")
      assert(es.searches.asScala.exists(_.has("aggs")),
        "empty-match min was not pushed")
      // a LONG extremum pushes, but never through the lossy double
      // metric agg: ONE size-1 sorted search reads the exact stored
      // _source value instead
      es.searches.clear(); es.counts.set(0); es.scrollCalls.set(0)
      val lmin = read(es).agg(min(col("doc_id"))).collect().head.getLong(0)
      assert(lmin == 0L)
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "long min pushed through the lossy double wire type")
      val sortReq = es.searches.asScala.find(_.has("sort"))
      assert(sortReq.isDefined, "long min did not send a sorted search")
      assert(sortReq.get.path("size").asInt(-1) == 1, sortReq.get.toString)
      assert(es.scrollCalls.get() == 0, "long min pushdown still scrolled")
    } finally es.stop()
  }

  test("long MIN/MAX via sorted search is bit-exact past 2^53") {
    // 2^53 = 9007199254740992: +1 and +5 are NOT double-representable
    // (they round to +0/+4), so an agg through ES's double wire type
    // would return the wrong longs — the sorted search must not
    val big = Seq(
      (9007199254740993L, "en", 0.1, false), // 2^53 + 1
      (9007199254740995L, "de", 0.2, false),
      (9007199254740997L, "fr", 0.3, true)) // 2^53 + 5
    val es = new MockEs(big)
    try {
      val df = read(es).agg(
        min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("EsAggScan"), plan.take(2000))
      val got = df.collect().head
      assert(got.getLong(0) == 9007199254740993L, s"min=${got.getLong(0)}")
      assert(got.getLong(1) == 9007199254740997L, s"max=${got.getLong(1)}")
      // wire shape: two size-1 sorted searches projecting only doc_id,
      // one ascending and one descending, no aggs body, no scroll
      val sorts = es.searches.asScala.filter(_.has("sort")).toSeq
      assert(sorts.size == 2, es.searches.asScala.mkString("|"))
      assert(sorts.forall(_.path("size").asInt(-1) == 1))
      assert(sorts.forall(r => r.get("_source").toString == "[\"doc_id\"]"),
        sorts.mkString("|"))
      val orders = sorts.map(
        _.get("sort").get(0).get("doc_id").get("order").asText()).toSet
      assert(orders == Set("asc", "desc"), orders.toString)
      // unmapped_type: a field with no mapping anywhere (empty index,
      // alias with non-uniform mappings) must sort-as-missing → NULL,
      // not fail the search with 400 "No mapping found"
      assert(sorts.forall(r => r.get("sort").get(0).get("doc_id")
        .path("unmapped_type").asText() == "long"), sorts.mkString("|"))
      assert(!es.searches.asScala.exists(_.has("aggs")))
      assert(es.scrollCalls.get() == 0, "sorted-extremum pushdown scrolled")
    } finally es.stop()
  }

  test("aggregates over ArrayType columns never push — ES sees " +
    "elements, Spark sees whole arrays") {
    val es = new MockEs
    try {
      es.multiValueDocId = Some(3L) // doc 3: score = [0.3, 1.3]
      es.emptyArrayDocId = Some(5L) // doc 5: score = [] (exists=false!)
      val arrSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("score", ArrayType(DoubleType))))
      val df = spark.read.schema(arrSchema)
        .format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "docs")
        .option("approxDistinct", "true").load()
      val got = df.agg(count(col("score")), countDistinct(col("score")))
        .collect().head
      // Spark counts doc 5's materialized [] as a non-null row — a
      // pushed exists-filter count would say 24, cardinality would
      // count distinct ELEMENTS; both must stay on the row scan
      assert(got.getLong(0) == docs.size.toLong, s"count=${got.getLong(0)}")
      assert(got.getLong(1) == docs.size.toLong, // every array distinct
        s"countDistinct=${got.getLong(1)}")
      assert(es.counts.get() == 0, "array count went to _count")
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "array-column aggregate pushed a server-side aggs body")
      assert(es.scrollCalls.get() > 0, "row scan never ran")
    } finally es.stop()
  }

  test("filters over ArrayType columns never push — ES exists/term " +
    "match per element, not per whole array") {
    val es = new MockEs
    try {
      es.emptyArrayDocId = Some(5L) // ES indexes NO value for doc 5
      val arrSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("score", ArrayType(DoubleType))))
      val df = spark.read.schema(arrSchema)
        .format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "docs").load()
        .filter(col("score").isNotNull)
      // Spark keeps doc 5: the reader materializes a non-null [] — a
      // pushed exists filter would have dropped it server-side
      assert(df.count() == docs.size.toLong)
      val sent = es.searches.asScala.map(_.path("query").toString)
      assert(!sent.exists(_.contains("\"exists\"")),
        s"array-column IsNotNull pushed as exists: ${sent.mkString("|")}")
    } finally es.stop()
  }

  test("grouped aggregates are NOT pushed without the keywordStrings " +
    "assertion — the scroll scan serves them") {
    val es = new MockEs
    try {
      val got = read(es).groupBy(col("lang")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
      // an ANALYZED string field would bucket per token: without the
      // keyword assertion the group key is not groupable, so no _count
      // call and no server-side aggs body — the rows stream through
      // the scan and Spark aggregates them
      assert(es.counts.get() == 0, "grouped count went to _count")
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "grouped count pushed a server-side aggs body")
      assert(es.searches.asScala.nonEmpty)
    } finally es.stop()
  }

  test("grouped count pushes as a paged composite aggregation") {
    val es = new MockEs
    try {
      val df = read(es, "keywordStrings" -> "true",
        "compositePageSize" -> "2").groupBy(col("lang")).count()
      val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
      assert(es.scrollCalls.get() == 0 && es.counts.get() == 0,
        "composite pushdown still ran a scan")
      val sent = es.searches.asScala.toSeq
      assert(sent.nonEmpty && sent.forall(s =>
        s.path("aggs").path("groups").has("composite")), sent.mkString("|"))
      // 3 langs at page size 2 → a second request resuming after_key
      val afters = sent.map(s => s.path("aggs").path("groups")
        .path("composite").path("after")).filterNot(_.isMissingNode)
      assert(sent.size >= 2 && afters.nonEmpty, s"paging never resumed: $sent")
      // missing_bucket requested: Spark's GROUP BY keeps null groups
      assert(sent.head.toString.contains("\"missing_bucket\":true"),
        sent.head.toString)
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }
      assert(scans.exists(_.startsWith("EsGroupedAggScan")), scans.toString)
      // explicit opt-out: when distinct groups approach the doc count,
      // the sliced scan + Spark shuffle agg is the better plan
      es.searches.clear()
      val off = read(es, "keywordStrings" -> "true",
        "groupedAggPushdown" -> "false").groupBy(col("lang")).count().collect()
      assert(off.length == 3)
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "opt-out still pushed the grouped agg")
    } finally es.stop()
  }

  test("grouped count/value_count/cardinality/fp extrema ride one " +
    "composite; a missing key forms Spark's null group") {
    val es = new MockEs
    try {
      es.nullLangDocId = Some(7L) // a doc with no lang value
      val df = read(es, "keywordStrings" -> "true",
        "approxDistinct" -> "true")
        .groupBy(col("lang"))
        .agg(count(col("*")).as("n"), count(col("score")).as("ns"),
          countDistinct(col("doc_id")).as("nd"),
          min(col("score")).as("lo"), max(col("score")).as("hi"))
      val got = df.collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
      val want = docs.map(d => (if (d._1 == 7L) null else d._2, d))
        .groupBy(_._1).view.mapValues { g =>
          val ss = g.map(_._2._3)
          (g.size.toLong, g.size.toLong,
            g.map(_._2._1).distinct.size.toLong, ss.min, ss.max)
        }.toMap
      assert(got == want)
      assert(got.contains(null), "missing_bucket null group lost")
      assert(es.scrollCalls.get() == 0, "scan ran despite pushdown")
    } finally es.stop()
  }

  test("grouped integral extrema and boolean group keys stay Spark-side") {
    val es = new MockEs
    try {
      // MIN(long) per group: the global path's exact size-1 sorted
      // search has no per-bucket analogue, and a metric agg's double
      // payload drops bits past 2^53 — the WHOLE aggregation row-scans
      val got = read(es, "keywordStrings" -> "true")
        .groupBy(col("lang")).agg(min(col("doc_id")).as("lo"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got ==
        docs.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap)
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "grouped integral extremum pushed")
      es.searches.clear()
      // boolean group key: a terms source renders boolean keys as 0/1
      // with key_as_string — a wire shape the reader refuses to guess
      val gb = read(es, "keywordStrings" -> "true")
        .groupBy(col("flagged")).count()
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      assert(gb == docs.groupBy(_._4).view.mapValues(_.size.toLong).toMap)
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "boolean group key pushed")
    } finally es.stop()
  }

  test("date group keys push only under dateMillisPushdown and return " +
    "exact NTZ keys") {
    val es = new MockEs
    try {
      def df(extra: (String, String)*) = {
        val r = spark.read.format(classOf[EsScrollSource].getName)
          .option("nodes", es.url).option("index", "docs")
          .option("keywordStrings", "true")
        extra.foreach { case (k, v) => r.option(k, v) }
        r.load().groupBy(col("created")).count()
      }
      val got = df("dateMillisPushdown" -> "true").collect()
        .map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
      val want = docs.map { d =>
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(es.dateBase + d._1 * 1000),
          java.time.ZoneOffset.UTC) -> 1L
      }.toMap
      assert(got == want)
      assert(es.scrollCalls.get() == 0, "scan ran despite date pushdown")
      // without the ms-alignment assertion a sub-ms _source value
      // would bucket differently server-side — stays Spark-side
      es.searches.clear()
      val off = df().collect()
      assert(off.length == docs.size)
      assert(!es.searches.asScala.exists(_.has("aggs")),
        "date group key pushed without dateMillisPushdown")
    } finally es.stop()
  }

  test("explicit ArrayType schema reads mixed scalar/array _source " +
    "pages; bulk sink round-trips arrays") {
    val es = new MockEs
    try {
      es.multiValueDocId = Some(3L) // doc 3 serves score as [v, v+1]
      val arrSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("score", ArrayType(DoubleType))))
      val got = spark.read.schema(arrSchema)
        .format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "docs").load()
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(got.size == docs.size)
      // scalar wire shape = ES's 1-element-array shorthand
      assert(got(2L) == Seq(0.2))
      assert(got(3L) == Seq(0.3, 1.3))
      // round-trip: arrays write as JSON arrays via _bulk
      import spark.implicits._
      val out = Seq((100L, Seq(1.0, 2.0))).toDF("doc_id", "score")
      EsBulkSink.write(out, es.url, "docs2", idCol = Some("doc_id"))
      assert(es.bulkBodies.asScala.exists(_.contains("\"score\":[1.0,2.0]")),
        es.bulkBodies.asScala.mkString("|"))
    } finally es.stop()
  }

  test("Or pushes as bool.should with minimum_should_match") {
    val es = new MockEs
    try {
      val df = read(es, "keywordStrings" -> "true")
        .filter(col("lang") === "en" || col("score") > 2.0)
      val got = df.collect().map(_.getLong(0)).toSet
      val want = docs.filter(d => d._2 == "en" || d._3 > 2.0).map(_._1).toSet
      assert(got == want && want.nonEmpty && want.size < docs.size)
      val sent = es.searches.asScala.head.get("query").toString
      assert(sent.contains("\"should\""), sent)
      assert(sent.contains("\"minimum_should_match\":1"), sent)
      assert(sent.contains("\"term\":{\"lang\":\"en\"}"), sent)
    } finally es.stop()
  }

  test("string range filters stay Spark-side unless keywordStrings is set") {
    val es = new MockEs
    try {
      // default safe mode: an ES range on an analyzed text field
      // compares TOKENS, not the value Spark compares — must not push
      val got = read(es).filter(col("lang") >= "fr")
        .collect().map(_.getLong(0)).toSet
      assert(got == docs.filter(_._2 >= "fr").map(_._1).toSet)
      val sent = es.searches.asScala.head.get("query").toString
      assert(!sent.contains("\"range\":{\"lang\""),
        s"string range pushed unsafely: $sent")
      // keyword-asserted mode: lexical range pushes and stays exact
      es.searches.clear()
      val got2 = read(es, "keywordStrings" -> "true")
        .filter(col("lang") >= "fr").collect().map(_.getLong(0)).toSet
      assert(got2 == docs.filter(_._2 >= "fr").map(_._1).toSet)
      val sent2 = es.searches.asScala.head.get("query").toString
      assert(sent2.contains("\"range\":{\"lang\""), sent2)
    } finally es.stop()
  }

  test("multi-index mapping union; conflicting field types fail fast") {
    val es = new MockEs
    try {
      val unioned = spark.read.format(classOf[EsScrollSource].getName)
        .option("nodes", es.url).option("index", "m2").load().schema
      assert(unioned.fieldNames.toSeq == Seq("doc_id", "lang", "score"))
      assert(unioned("doc_id").dataType == LongType &&
        unioned("lang").dataType == StringType &&
        unioned("score").dataType == DoubleType)
      val err = intercept[IllegalArgumentException] {
        spark.read.format(classOf[EsScrollSource].getName)
          .option("nodes", es.url).option("index", "mbad").load().schema
      }
      assert(err.getMessage.contains("conflicting mappings"), err.getMessage)
    } finally es.stop()
  }

  test("strict _source typing: a multi-valued field fails loudly, " +
    "never coerces to Jackson defaults") {
    val es = new MockEs
    try {
      // ES legally stores arrays in ANY field with no mapping signal;
      // asLong() on the array would silently read 0
      es.multiValueDocId = Some(3L)
      val err = intercept[org.apache.spark.SparkException] {
        read(es).collect()
      }
      val msg = Option(err.getCause).map(_.getMessage).getOrElse(err.getMessage)
      assert(msg != null && msg.contains("multi-valued"), msg)
    } finally es.stop()
  }

  test("custom date formats fail fast at inferSchema, not misparse") {
    val es = new MockEs
    try {
      val err = intercept[UnsupportedOperationException] {
        spark.read.format(classOf[EsScrollSource].getName)
          .option("nodes", es.url).option("index", "mdate").load().schema
      }
      assert(err.getMessage.contains("epoch_second"), err.getMessage)
    } finally es.stop()
  }

  test("bulk sink rejects null ids instead of silently losing " +
    "retry idempotency") {
    import spark.implicits._
    val es = new MockEs(Seq.empty)
    try {
      val rows = Seq((java.lang.Long.valueOf(1L), "en", 0.5, true),
        (null.asInstanceOf[java.lang.Long], "de", 0.7, false))
        .toDF("doc_id", "lang", "score", "flagged")
      // driver-side pre-probe: fails BEFORE any bulk request is sent,
      // so a partition can never be left partially written (the
      // in-partition guard only fires after earlier buffers flushed)
      val err = intercept[IllegalArgumentException] {
        EsBulkSink.write(rows, es.url, "docs", idCol = Some("doc_id"))
      }
      assert(err.getMessage.contains("contains nulls"), err.getMessage)
      assert(es.bulks.get() == 0, "a bulk request was sent despite null ids")
    } finally es.stop()
  }

  test("null-valued comparisons and timestamp columns never push") {
    import org.apache.spark.sql.sources._
    // term:null / range:null are ES 400s that would fail the whole scan
    assert(!EsQuery.translatable(EqualTo("score", null), schema, true))
    assert(!EsQuery.translatable(GreaterThan("score", null), schema, true))
    assert(EsQuery.translatable(EqualTo("score", 1.0), schema, true))
    // timestamp wire format is mapping-dependent — value comparisons
    // stay Spark-side even under keywordStrings
    val withTs = schema.add(StructField("created", TimestampNTZType))
    assert(!EsQuery.translatable(
      GreaterThan("created", java.time.LocalDateTime.now()), withTs, true))
    assert(EsQuery.translatable(IsNotNull("created"), withTs, true))
  }
}
