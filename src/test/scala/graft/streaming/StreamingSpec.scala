package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming surface is REAL: the tumbling aggregation runs as a
  * Structured Streaming query (parquet source → memory sink) and must
  * produce exactly the batch result.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling agg equals batch result") {
    val batch = StreamingOps.tumblingHourlyStream(Tables.events(spark, dir))
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6)))

    // streaming parquet source wants a directory
    val tmp = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(StreamingOps.eventsReadSchema(spark, tmp.toString))
      .parquet(tmp.toString)
    val agg = StreamingOps.tumblingHourlyStream(StreamingOps.withTs(stream))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tumbling_out").orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6)))
    assert(got.nonEmpty && got.toSeq == batch.toSeq)
  }

  test("streaming session_window sessionization equals batch gap sessions") {
    // real stateful streaming: session_window with 30-min gap
    val tmp = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = StreamingOps.withEventTime(StreamingOps.withTs(
      spark.readStream
        .schema(StreamingOps.eventsSchema).parquet(tmp.toString)))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_out")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_ev"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = StreamingOps.sessionize(Tables.events(spark, dir), 30)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_ev"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.toSeq == batch.toSeq)
  }

  test("stream-stream interval join equals the batch interval join") {
    val ev = Tables.events(spark, dir)
    val batch = StreamingOps.intervalJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "user_id", 1800000000L)
      .orderBy("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tmp = java.nio.file.Files.createTempDirectory("events_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    def stream = StreamingOps.withTs(spark.readStream
      .schema(StreamingOps.eventsSchema).parquet(tmp.toString))
    val joined = StreamingOps.intervalJoinStream(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"),
      "user_id", 1800000000L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_out").orderBy("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq == batch.toSeq)
  }

  test("flatMapGroupsWithState running totals carry state ACROSS micro-batches") {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("value")).as[UserEvent].collect()
    // two micro-batches: state from batch 1 must fold into batch 2
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent]
    val totals = StreamingOps.userTotalsStream(input.toDF())
    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName("user_totals_out").start()
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()

    // final state per user = the row with the highest n_events emitted
    val got = spark.table("user_totals_out")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("sum_value"), col("n_events")).as("sum_value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    val want = StreamingOps.userTotals(Tables.events(spark, dir))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("streaming exact-dedup suppresses cross-micro-batch duplicates") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .as[(Long, String)].collect()
    val nDistinct = docs.map(_._2).distinct.length
    // batch 2 repeats half of batch 1 — state must suppress re-emission
    val (b1, b2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "fp")
      .dropDuplicates("fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq ++ b1.take(b1.length / 2).toSeq)
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("dedup_out").collect().map(_.getString(1))
    assert(emitted.length == emitted.distinct.length) // no fp emitted twice
    assert(emitted.distinct.length == nDistinct)      // every fp exactly once
  }

  test("stream-static broadcast enrichment equals the batch join") {
    // static dim: user -> nation name via customer (user_id draws from
    // the same key space as c_custkey at this sf)
    val dim = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name"))
    def rollup(ev: org.apache.spark.sql.DataFrame) =
      StreamingOps.enrich(ev, dim, "user_id")
        .groupBy("n_name").agg(count(lit(1)).as("n"))
    val batch = rollup(Tables.events(spark, dir))
      .orderBy("n_name").collect().map(r => (r.getString(0), r.getLong(1)))

    val tmp = java.nio.file.Files.createTempDirectory("events_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = StreamingOps.withTs(spark.readStream
      .schema(StreamingOps.eventsSchema).parquet(tmp.toString))
    val q = rollup(stream).writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out").orderBy("n_name")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.toSeq == batch.toSeq)
  }

  test("watermark drops late data in append mode, windows emit once") {
    import spark.implicits._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    input.addData(Seq((ts("10:05"), 1.0), (ts("10:10"), 1.0)))
    q.processAllAvailable()                 // watermark still before 11:00
    input.addData(Seq((ts("12:30"), 1.0))) // advances watermark to 12:20
    q.processAllAvailable()                 // -> closes + emits the 10:00 window
    input.addData(Seq((ts("10:15"), 1.0))) // LATE: behind the watermark
    q.processAllAvailable()                 // must be dropped, no re-emission
    input.addData(Seq((ts("14:30"), 1.0))) // advances watermark past 13:00
    q.processAllAvailable()                 // -> closes + emits the 12:00 window
    q.stop()
    val got = spark.table("late_out").orderBy("wstart").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    // 10:00 window counts 2 (late event excluded), emitted exactly once;
    // 12:00 window counts 1; 14:00 still open -> never emitted
    assert(got == Seq((ts("10:00"), 2L), (ts("12:00"), 1L)))
  }

  test("sessionization: session count and event conservation") {
    val sess = StreamingOps.sessionize(Tables.events(spark, dir), 30)
    val events = Tables.events(spark, dir)
    val totalEvents = events.count()
    val row = sess.agg(sum(col("n_events")), count(lit(1))).head()
    assert(row.getLong(0) == totalEvents) // every event in exactly one session
    assert(row.getLong(1) >= events.select(col("user_id")).distinct().count())
    // all durations non-negative, sessions internally gap-bounded
    assert(sess.filter(col("duration_us") < 0).count() == 0)
  }

  test("checkpointed file sink: restart resumes exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ckpt").toString
    val (out, ckpt) = (s"$tmp/out", s"$tmp/ckpt")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    def start() = input.toDF().toDF("id", "v")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").start(out)
    val q1 = start()
    input.addData((1L, 1.0), (2L, 2.0))
    q1.processAllAvailable()
    q1.stop()
    // restart FROM THE CHECKPOINT: batch 1 must not be re-emitted,
    // batch 2 must be picked up
    input.addData((3L, 3.0))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)), got.toString)
  }

  test("row-local minhash band keys equal the batch groupBy signature") {
    // the streaming path must agree with Dedup.minhashSignatureArr on
    // every document (same permutation family, same band layout)
    val docs = Tables.load(spark, dir, "documents").limit(100)
    val batchSig = graft.ops.Dedup.minhashSignatureArr(
        graft.ops.Dedup.shingles(docs, "doc_id", "text"), 16)
      .select(col("id"), posexplode(col("sig")).as(Seq("i", "v")))
    val streamSig = docs.select(col("doc_id").as("id"),
        posexplode(StreamingOps.minhashBandKeys(col("text"), 16, 4, 3))
          .as(Seq("band", "bk")))
      .select(col("id"), col("band"), col("bk.key").as("key"))
    // reassemble the row-local signature from its band keys and diff
    val fromBands = streamSig
      .select(col("id"), col("band"), split(col("key"), ",").as("parts"))
      .select(col("id"), col("band"), posexplode(col("parts")).as(Seq("j", "v")))
      .select(col("id"), (col("band") * 4 + col("j")).as("i"),
        col("v").cast("long").as("v"))
    assert(batchSig.join(fromBands, Seq("id", "i"))
      .filter(batchSig("v") =!= fromBands("v")).count() == 0)
    assert(fromBands.count() == batchSig.count())
  }

  test("streaming near-dup gate suppresses band-sharing docs across batches") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    val t3 = "red green blue cyan magenta yellow black white gray pink"
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val kept = scala.collection.concurrent.TrieMap.empty[Long, Unit]
    val q = StreamingOps.nearDupClaims(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (claims: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        StreamingOps.nearDupKeep(claims).collect()
          .foreach(r => kept.put(r.getLong(0), ()))
      }
      .start()
    input.addData((1L, t1), (2L, t2))
    q.processAllAvailable()
    // 3 = exact repeat of doc 1 (all bands collide), 4 = novel;
    // 5 and 6 are DISTINCT sub-n-token docs — they claim no bands at
    // all (the empty-shingle guard), so neither may suppress the
    // other, and having no claims they are not emitted as kept either
    input.addData((3L, t1), (4L, t3), (5L, "hi there"), (6L, "bye now"))
    q.processAllAvailable()
    q.stop()
    assert(kept.keySet == Set(1L, 2L, 4L), s"kept=${kept.keySet}")
  }

  test("streaming embedding gate: exact dup suppressed, batch parity") {
    import spark.implicits._
    val dims = 8
    val vA = Seq(1.0, 0.2, -0.5, 0.7, -0.1, 0.4, -0.9, 0.3)
    val vB = Seq(-0.8, 0.9, 0.1, -0.6, 0.5, -0.3, 0.2, -0.7)
    val vC = Seq(0.1, -0.9, 0.8, 0.2, -0.6, 0.7, 0.4, -0.2)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val kept = scala.collection.concurrent.TrieMap.empty[Long, Unit]
    val q = StreamingOps.embedDupClaims(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        dims = dims)
      .writeStream.outputMode("append")
      .foreachBatch { (claims: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        StreamingOps.embedDupKeep(claims).collect()
          .foreach(r => kept.put(r.getLong(0), ()))
      }
      .start()
    input.addData((1L, vA), (2L, vB))
    q.processAllAvailable()
    // 3 is an exact copy of 1: every band key collides -> suppressed
    input.addData((3L, vA), (4L, vC))
    q.processAllAvailable()
    q.stop()
    assert(kept.contains(1L) && !kept.contains(3L), s"kept=${kept.keySet}")
    // ids arrive in order, so first-arrival == min-id: the streaming
    // keeps must equal the deterministic batch gate over the union
    val batchKeeps = StreamingOps.embedDupKeepBatch(
        Seq((1L, vA), (2L, vB), (3L, vA), (4L, vC))
          .toDF("vec_id", "embedding"), "vec_id", "embedding", dims = dims)
      .filter(col("keep") === 1).collect().map(_.getLong(0)).toSet
    assert(kept.keySet == batchKeeps, s"${kept.keySet} vs $batchKeeps")
  }

  test("streaming windowed hll_est equals batch across micro-batches") {
    val batch = StreamingOps.approxUsersHourlyStream(
        Tables.events(spark, dir)).orderBy("hour")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq

    // TWO copies of the file + maxFilesPerTrigger=1 → two micro-batches
    // over the same rows: the per-window register state must MERGE
    // across batches, and HLL's duplicate-insensitivity means the
    // estimate is unchanged while n_events doubles — the exact
    // property that makes the sketch streaming-safe.
    val tmp = java.nio.file.Files.createTempDirectory("events_hll")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("b.parquet"))
    val stream = spark.readStream
      .schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp.toString)
    val q = StreamingOps.approxUsersHourlyStream(StreamingOps.withTs(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("hll_out").orderBy("hour")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == batch.length && got.nonEmpty)
    got.zip(batch).foreach { case ((gh, ge, _), (bh, be)) =>
      assert(gh == bh && ge == be, s"window $gh: stream=$ge batch=$be")
    }
  }

  test("CDC stream -> SCD2 upsert: foreachBatch incremental merge equals full recompute") {
    import spark.implicits._
    // change events arriving over three micro-batches; batch 2 extends
    // key 1's history and introduces key 3, batch 3 touches key 2
    val batches = Seq(
      Seq((1L, 1L, 10L, "A"), (2L, 2L, 10L, "X")),
      Seq((1L, 3L, 30L, "B"), (3L, 4L, 5L, "Z")),
      Seq((2L, 5L, 40L, "Y"), (1L, 6L, 50L, "B")))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    // the maintained silver state: an event store + the dim, both
    // re-materialized per batch (local rows; a real deployment writes
    // a table and reads it back)
    var store = Seq.empty[(Long, Long, Long, String)]
    var dim: Array[org.apache.spark.sql.Row] = Array.empty
    val q = input.toDF().toDF("u", "id", "t", "attr")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val batch = b.as[(Long, Long, Long, String)].collect().toSeq
        val storeDf = store.toDF("u", "id", "t", "attr")
        val batchDf = batch.toDF("u", "id", "t", "attr")
        dim = graft.ops.Scd2.mergeIntervals(storeDf, batchDf,
          "u", "t", "attr", Seq("id")).collect()
        store = store ++ batch
      }.start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val got = dim.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(x => (x._1, x._3))
    val want = graft.ops.Scd2.intervals(
        batches.flatten.toDF("u", "id", "t", "attr"), "u", "t", "attr",
        Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(x => (x._1, x._3))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // the late change at t=50 with the SAME attr as key 1's open
    // version must have collapsed into it, not opened a new version
    assert(got.count(x => x._1 == 1L && x._2 == "B") == 1)
  }

  test("streaming anomaly gate: batch-fitted stats score the stream identically") {
    import spark.implicits._
    val hist = Seq(("a", 1.0), ("a", 1.2), ("a", 0.8), ("a", 25.0),
      ("b", 5.0), ("b", 5.1)).toDF("g", "v")
    val stats = graft.ops.Anomaly.momentStats(hist, "g", "v")
    val want = graft.ops.Anomaly.applyStats(hist, stats, "g", "v",
        threshold = 1.5)
      .select("g", "v", "is_anomaly").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getBoolean(2)).toMap

    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val q = graft.ops.Anomaly.applyStats(input.toDF().toDF("g", "v"),
        stats, "g", "v", threshold = 1.5)
      .select("g", "v", "is_anomaly")
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    // two micro-batches; the stream also carries an unseen group
    input.addData(("a", 1.0), ("a", 25.0))
    q.processAllAvailable()
    input.addData(("b", 5.0), ("zzz", 99.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("anom_out").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    assert(got(("a", 25.0)) && !got(("a", 1.0)) && !got(("b", 5.0)))
    assert(!got(("zzz", 99.0))) // unseen group: null stats, unflagged
    got.filterNot(_._1._1 == "zzz").foreach { case (k, f) =>
      assert(f == want(k), s"$k stream=$f batch=${want(k)}")
    }
  }

  test("streaming rollup maintenance: foreachBatch folds deltas into the aggregate state") {
    import spark.implicits._
    val batches = Seq(
      Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)),
      Seq((1L, 30.0), (3L, 7.0)),
      Seq((2L, 1.0), (3L, 2.0), (3L, 3.0)))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    var state: Array[org.apache.spark.sql.Row] = Array.empty
    var stateDf = graft.ops.IncrementalAgg.build(
      Seq.empty[(Long, Double)].toDF("k", "v"), "k", "v")
    val schema = stateDf.schema
    val q = input.toDF().toDF("k", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        stateDf = spark.createDataFrame(
          spark.sparkContext.parallelize(state.toSeq), schema)
        state = graft.ops.IncrementalAgg.merge(stateDf,
          b.toDF("k", "v"), "k", "v").collect()
      }.start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val got = spark.createDataFrame(
      spark.sparkContext.parallelize(state.toSeq), schema)
    val want = graft.ops.IncrementalAgg.build(
      batches.flatten.toDF("k", "v"), "k", "v")
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    assert(state.length == 3)
  }

  test("streaming windowed heavy-hitters merges sketches across micro-batches") {
    val batch = StreamingOps.topUsersHourly(Tables.events(spark, dir))
      .select(Tables.ntzMicros(col("hour")).as("h"), col("term"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap

    // two copies, one file per micro-batch: in the exact regime the
    // merged sketch counts must be exactly 2x the single-copy batch,
    // with the same (window, term) key set — the mergeable-summaries
    // reduction with zero evictions
    val tmp = java.nio.file.Files.createTempDirectory("events_hh")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("b.parquet"))
    val stream = spark.readStream
      .schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp.toString)
    val q = StreamingOps.topUsersHourlyStream(StreamingOps.withTs(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("hh_out")
      .select(unix_micros(col("hour")).as("h"), col("term"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.keySet == batch.keySet && got.nonEmpty)
    got.foreach { case (k, c) =>
      assert(c == 2 * batch(k), s"$k: stream=$c batch=${batch(k)}")
    }
  }
}
