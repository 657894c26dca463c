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
    // scroll_id -> (remaining rows, page size)
    private val cursors =
      new java.util.concurrent.ConcurrentHashMap[String, (List[Int], Int)]()
    private val nextId = new AtomicInteger(0)

    private def evalQuery(q: JsonNode, i: Int): Boolean = {
      val (id, lang, score, flagged) = store.get(i)
      def field(name: String): Any = name match {
        case "doc_id" => id
        case "lang" => lang
        case "score" => score
        case "flagged" => flagged
      }
      if (q.has("match_all")) true
      else if (q.has("term")) {
        val f = q.get("term").properties().asScala.head
        field(f.getKey).toString == f.getValue.asText()
      } else if (q.has("terms")) {
        val f = q.get("terms").properties().asScala.head
        f.getValue.elements().asScala.exists(v =>
          field(f.getKey).toString == v.asText())
      } else if (q.has("range")) {
        val f = q.get("range").properties().asScala.head
        val v = field(f.getKey).asInstanceOf[Double]
        f.getValue.properties().asScala.forall { b =>
          val bound = b.getValue.asDouble()
          b.getKey match {
            case "gt" => v > bound
            case "gte" => v >= bound
            case "lt" => v < bound
            case "lte" => v <= bound
          }
        }
      } else if (q.has("exists")) true // no null fields in the fixture
      else if (q.has("bool")) {
        val b = q.get("bool")
        val must = !b.has("filter") ||
          b.get("filter").elements().asScala.forall(evalQuery(_, i))
        val mustNot = !b.has("must_not") ||
          !evalQuery(b.get("must_not"), i)
        must && mustNot
      } else sys.error(s"mock cannot evaluate: $q")
    }

    private def page(key: String): String = {
      val (rows, size) = cursors.get(key)
      val (now, later) = rows.splitAt(size)
      cursors.put(key, (later, size))
      val resp = mapper.createObjectNode()
      resp.put("_scroll_id", key)
      val hitsArr = resp.putObject("hits").putArray("hits")
      now.foreach { i =>
        val (id, lang, score, flagged) = store.get(i)
        val src = hitsArr.addObject().putObject("_source")
        src.put("doc_id", id); src.put("lang", lang)
        src.put("score", score); src.put("flagged", flagged)
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
        } else if (path.endsWith("/_mapping")) {
          """{"docs":{"mappings":{"properties":{
            "doc_id":{"type":"long"},"lang":{"type":"keyword"},
            "score":{"type":"double"},"flagged":{"type":"boolean"}}}}}"""
            .replaceAll("\\s+", "")
        } else if (path.endsWith("/_bulk")) {
          bulks.incrementAndGet()
          body.linesIterator.filter(_.nonEmpty).grouped(2).foreach { pair =>
            val doc = mapper.readTree(pair(1))
            store.add((doc.get("doc_id").asLong(), doc.get("lang").asText(),
              doc.get("score").asDouble(), doc.get("flagged").asBoolean()))
          }
          """{"errors":false,"items":[]}"""
        } else if (path.endsWith("/_search")) {
          val req = mapper.readTree(body)
          searches.add(req)
          val size = req.path("size").asInt(1000)
          val (sid, smax) =
            if (req.has("slice"))
              (req.get("slice").get("id").asInt(),
                req.get("slice").get("max").asInt())
            else (0, 1)
          val rows = (0 until store.size)
            .filter(_ % smax == sid)
            .filter(i => evalQuery(req.get("query"), i)).toList
          val key = s"scroll-${nextId.incrementAndGet()}"
          cursors.put(key, (rows, size))
          page(key)
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
        Seq("doc_id", "flagged", "lang", "score"))
      assert(df.schema("doc_id").dataType == LongType &&
        df.schema("lang").dataType == StringType &&
        df.schema("score").dataType == DoubleType &&
        df.schema("flagged").dataType == BooleanType)
      assert(df.count() == docs.length)
    } finally es.stop()
  }
}
