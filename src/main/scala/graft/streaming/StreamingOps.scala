package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.core.Tables

/** Event projection consumed by the stateful per-user operators. */
final case class UserEvent(user_id: Long, value: Double)

/** Running per-user totals — the explicit state carried across
  * micro-batches by [[StreamingOps.userTotalsStream]].
  */
final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** Structured-Streaming surface (north-star §7.5: the reference has
  * no streaming — its "stream" is a cursor-paged batch iterator,
  * dataset.py:189-225). The engine declares real stream semantics
  * over the `events` table:
  *
  *  - tumbling-window aggregation (the same logical plan serves batch
  *    and `readStream` — verified equal in StreamingSpec);
  *  - 30-minute-gap sessionization, expressed in batch form with
  *    windowed lag/cumsum (the streaming form maps to
  *    session_window / flatMapGroupsWithState).
  *
  * Scale shape: both group by (window/user) keys — shuffle-keyed,
  * watermark-bounded state in the streaming case.
  */
object StreamingOps {

  /** Read schema for the CURRENT testdata vintage (timestamp[us] →
    * TIMESTAMP_NTZ). Streaming reads need an explicit schema, so the
    * old TIMESTAMP(NANOS) vintage (scanned as raw-nanos BIGINT under
    * `nanosAsLong`) cannot be auto-detected here — use
    * [[eventsReadSchema]], which peeks at the files with a one-off
    * batch scan, when the vintage is unknown.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType), // parquet timestamp[us]
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Vintage-aware read schema for a concrete `events` parquet path:
    * a footer-only batch scan yields the dtype Spark will actually
    * surface for `ts` (LongType raw-nanos vs TimestampNTZType), and
    * the streaming read schema mirrors it so [[withTs]]'s dtype
    * branch stays correct on either vintage.
    */
  def eventsReadSchema(spark: SparkSession, path: String): StructType = {
    val scanned = spark.read.parquet(path).schema
    StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = scanned("ts").dataType) else f))
  }

  /** Normalize `ts` to TIMESTAMP_NTZ; schema-aware so the same entry
    * point serves both testdata vintages (raw-nanos BIGINT vs
    * timestamp[us]) — see [[graft.core.Tables.normTs]]. NTZ in, NTZ
    * out: no session-timezone dependence anywhere downstream.
    */
  def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", Tables.normTs(df))

  private val HourUs = 3600L * 1000000L

  /** Structured Streaming event time must be TimestampType
    * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), so the streaming
    * flavors convert at entry — TZ-FREE: the instant is built as
    * wall-as-UTC via `timestamp_micros(ntzMicros(ts))`, never an
    * NTZ→LTZ session-zone cast. window()/watermark arithmetic on
    * instants is pure epoch math, so emitted window starts carry the
    * same epochs the batch flavors' NTZ truncations do. A ts that is
    * already an instant (or raw-nanos BIGINT) normalizes through the
    * same schema-aware branch.
    */
  def withEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampType => df
      case _ => df.withColumn("ts",
        timestamp_micros(Tables.tsMicros(df)))
    }

  /** Tumbling 1-hour aggregation; identical plan for batch input and
    * readStream input.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events.groupBy(
        Tables.truncNtz(col("ts"), HourUs).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 12))).cast("double").as("sum_value"))

  /** Streaming flavor: explicit window() + watermark (append-ready). */
  def tumblingHourlyStream(events: DataFrame): DataFrame =
    withEventTime(events).withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 12))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes: each event lands in 4
    * overlapping windows (Spark's window() generator — a bounded 4×
    * row expansion, then one shuffle keyed on (window, type), map-side
    * combined). Same plan batch and readStream (with a watermark for
    * append mode, as in [[tumblingHourlyStream]]).
    */
  def slidingHourly(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 12))).cast("double").as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))

  /** Per-user running totals, batch form (the oracle semantics of
    * [[userTotalsStream]]): one shuffle keyed on user_id, map-side
    * combined; money-exact DECIMAL sum before the double cast.
    */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 12))).cast("double").as("sum_value"))

  /** Per-user running totals as CUSTOM streaming state
    * (flatMapGroupsWithState, Update mode): each micro-batch folds its
    * new events into the per-user state and emits the updated totals —
    * the §2.9 shape for state no built-in aggregate expresses (the
    * totals here are deliberately simple so the batch oracle can check
    * them; the state could equally carry a sketch or a model update).
    * State is partitioned by user_id — shuffle-keyed, bounded by
    * |users|; production would add a GroupStateTimeout eviction policy.
    */
  def userTotalsStream(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    // primitive-keyed state cannot represent an anonymous user, and a
    // null value would kill the STREAM at the encoder ('null in
    // non-nullable field') rather than null-skip like the batch
    // oracle's sum — drop those rows before the encoder (same guard
    // as topUsersHourly; documented divergence from userTotals, which
    // groups the null key)
    events.select(col("user_id"), col("value"))
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent],
         state: org.apache.spark.sql.streaming.GroupState[UserTotals]) =>
          var dn = 0L
          var dsum = 0.0
          it.foreach { ev => dn += 1; dsum += ev.value }
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val next = UserTotals(uid, prev.n_events + dn, prev.sum_value + dsum)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (broadcast — the dim is the small side by construction;
    * Spark re-plans the join per batch, so a dim refreshed between
    * batches is picked up). No streaming state involved; the watermark
    * story of the downstream aggregation is unchanged.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join, batch form (the oracle semantics of
    * [[intervalJoinStream]]): pairs of (left, right) events of the
    * same key with right within [left_ts, left_ts + gap]. An
    * equi-join on the key with a post-join range filter — SMJ/shuffle
    * keyed on the join key, the shape the streaming flavor's
    * watermark-bounded state mirrors. Emits (key, l_id, r_id,
    * gap_us).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   gapUs: Long): DataFrame = {
    val l = left.select(col(key), col("event_id").as("l_id"),
      Tables.ntzMicros(col("ts")).as("l_us"))
    val r = right.select(col(key), col("event_id").as("r_id"),
      Tables.ntzMicros(col("ts")).as("r_us"))
    l.join(r, Seq(key))
      .filter(col("r_us") >= col("l_us") &&
        col("r_us") - col("l_us") <= gapUs)
      .select(col(key), col("l_id"), col("r_id"),
        (col("r_us") - col("l_us")).as("gap_us"))
  }

  /** Streaming flavor: both sides watermarked, the time-range bound
    * in the JOIN CONDITION — that bound is what lets Spark expire
    * per-key join state once the watermark passes l_ts + gap, keeping
    * state proportional to the window, not the stream. Inner join ⇒
    * append mode.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         gapUs: Long): DataFrame = {
    val l = withEventTime(left).select(col(key), col("event_id").as("l_id"),
      col("ts").as("l_ts")).withWatermark("l_ts", "1 hour")
    val r = withEventTime(right).select(col(key).as("r_key"), col("event_id").as("r_id"),
      col("ts").as("r_ts")).withWatermark("r_ts", "1 hour")
    l.join(r,
        col(key) === col("r_key") && col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"interval $gapUs microseconds"))
      .select(col(key), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
  }

  /** Row-LOCAL MinHash signature band keys — the streaming-safe form
    * of [[graft.ops.Dedup.minhashSignatureArr]]: everything (tokens →
    * hashed 3-gram shingles → per-permutation minima → band keys) is
    * one column expression, so the dedup stream below carries exactly
    * ONE stateful operator. The permutation arithmetic is identical to
    * the batch path (same (2i+3)x + (5i+7) mod P family); the
    * array-lambda form re-derives the permuted values per hash — a
    * numHashes× recompute that is the right trade here, buying
    * shuffle-freedom for the per-row stage (the batch path, which can
    * afford a shuffle, uses the groupBy form instead).
    * Returns array< struct(band int, key string) >.
    */
  def minhashBandKeys(text: org.apache.spark.sql.Column, numHashes: Int = 16,
                      rowsPerBand: Int = 4, n: Int = 3): org.apache.spark.sql.Column = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes $numHashes must be a multiple of rowsPerBand $rowsPerBand")
    val P = graft.ops.Dedup.P
    val toks = graft.ops.TextAnalysis.tokens(text)
    val grams = graft.functions.Let.bind(toks) { tk =>
      when(size(tk) >= n,
        array_distinct(transform(sequence(lit(1), size(tk) - lit(n - 1)), i =>
          graft.ops.Dedup.shingleInt(concat_ws(" ",
            (0 until n).map(o => element_at(tk, i + lit(o))): _*)) % lit(P))))
        .otherwise(array().cast("array<long>"))
    }
    val nBands = numHashes / rowsPerBand
    // a doc shorter than n tokens has NO shingles and must claim NO
    // bands (array_min over the empty gram set is null and concat_ws
    // skips nulls, so without the guard every short doc would share
    // the "" key on every band — the first one would then suppress
    // all the others as fake near-dups). Empty bands == the batch
    // gate's behavior (absent from the shingle table entirely).
    graft.functions.Let.bind(grams) { g =>
      when(size(g) === 0,
        array().cast("array<struct<band:int,key:string>>"))
        .otherwise(graft.functions.Let.bind(
          transform(sequence(lit(0), lit(numHashes - 1)), h =>
            array_min(transform(g, x =>
              (x * (h * 2 + lit(3)) + (h * 5 + lit(7))) % lit(P))))) { sig =>
          transform(sequence(lit(0), lit(nBands - 1)), b =>
            struct(b.cast("int").as("band"),
              graft.ops.Dedup.bandKey(sig, b, rowsPerBand).as("key")))
        })
    }
  }

  /** Streaming near-duplicate CLAIMS: each document tries to claim
    * its LSH band keys; `dropDuplicates` state awards every (band,
    * key) to its FIRST claimant across the stream's lifetime. A
    * document that claims ALL of its bands is novel; one that loses
    * any band shares that band with an earlier document — the
    * standard streaming-ingest near-dup gate, with the banding
    * approximation inherited from MinHash-LSH. State is one entry per
    * distinct band key — content-bounded, shuffle-keyed on the band
    * key. Pair with [[nearDupKeep]] inside `foreachBatch`.
    */
  def nearDupClaims(docs: DataFrame, idCol: String, textCol: String,
                    numHashes: Int = 16, rowsPerBand: Int = 4,
                    n: Int = 3): DataFrame =
    // NOTE: nearDupKeep must be called with the SAME numHashes /
    // rowsPerBand — it filters on claiming all numHashes/rowsPerBand
    // bands, so mismatched parameters reject every document.
    docs.select(col(idCol).as("doc_id"),
        explode(minhashBandKeys(col(textCol), numHashes, rowsPerBand, n))
          .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .dropDuplicates("band", "key")

  /** Batch reduction for `foreachBatch` over [[nearDupClaims]]: the
    * documents of this micro-batch that claimed ALL nBands of their
    * band keys (no band shared with any earlier document).
    */
  def nearDupKeep(claims: DataFrame, numHashes: Int = 16,
                  rowsPerBand: Int = 4): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes $numHashes must be a multiple of rowsPerBand $rowsPerBand")
    claims.groupBy(col("doc_id")).agg(count(lit(1)).as("n_claims"))
      .filter(col("n_claims") === (numHashes / rowsPerBand))
      .select(col("doc_id"))
  }

  /** Row-LOCAL banded LSH bucket keys for an EMBEDDING stream — the
    * vector analog of [[minhashBandKeys]]: each of `numBands` bands
    * hashes the vector with its own independent family of
    * `planesPerBand` sign-random-projection hyperplanes
    * ([[graft.ops.Similarity.lshBucket]] at planeOffset =
    * band·planesPerBand). Pure column expression (every dot is one
    * codegen'd VecDot against a literal plane), so the claims stream
    * carries exactly ONE stateful operator. Every vector claims all
    * bands (no empty case — unlike shingles, a vector always hashes).
    * Returns array< struct(band int, key bigint) >.
    */
  def embedBandKeys(vec: org.apache.spark.sql.Column, dims: Int,
                    planesPerBand: Int = 4, numBands: Int = 4): org.apache.spark.sql.Column =
    array((0 until numBands).map(b =>
      struct(lit(b).as("band"),
        graft.ops.Similarity.lshBucket(vec, dims, planesPerBand,
          planeOffset = b * planesPerBand).as("key"))): _*)

  /** Streaming embedding near-dup CLAIMS: each vector claims its
    * banded LSH buckets; `dropDuplicates` state awards every (band,
    * key) to its FIRST claimant across the stream. State is one entry
    * per distinct (band, bucket) — content-bounded, shuffle-keyed on
    * the bucket. Pair with [[embedDupKeep]] inside `foreachBatch`.
    */
  def embedDupClaims(emb: DataFrame, idCol: String, vecCol: String,
                     dims: Int, planesPerBand: Int = 4,
                     numBands: Int = 4): DataFrame =
    emb.select(col(idCol).as("vec_id"),
        explode(embedBandKeys(col(vecCol), dims, planesPerBand, numBands))
          .as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .dropDuplicates("band", "key")

  /** Batch reduction for `foreachBatch` over [[embedDupClaims]]: the
    * vectors of this micro-batch that claimed ALL their bands.
    */
  def embedDupKeep(claims: DataFrame, numBands: Int = 4): DataFrame =
    claims.groupBy(col("vec_id")).agg(count(lit(1)).as("n_claims"))
      .filter(col("n_claims") === numBands)
      .select(col("vec_id"))

  /** Deterministic BATCH form of the embedding gate (min-id wins each
    * (band, bucket), survive iff all bands won — same award rule as
    * [[nearDupKeepBatch]]). Returns (vec_id, n_bands, n_won, keep).
    */
  def embedDupKeepBatch(emb: DataFrame, idCol: String, vecCol: String,
                        dims: Int, planesPerBand: Int = 4,
                        numBands: Int = 4): DataFrame = {
    // same double-consumption as nearDupKeepBatch's claims: pin so
    // the banded VecDot projections run once
    val claims = graft.core.Pins.pin(emb.select(col(idCol).as("vec_id"),
        explode(embedBandKeys(col(vecCol), dims, planesPerBand, numBands))
          .as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key")))
    val winners = claims.groupBy(col("band"), col("key"))
      .agg(min(col("vec_id")).as("winner"))
    claims.join(winners, Seq("band", "key"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_bands"),
        sum(when(col("winner") === col("vec_id"), 1L).otherwise(0L)).as("n_won"))
      .withColumn("keep", (col("n_won") === col("n_bands")).cast("int"))
  }

  /** Deterministic BATCH form of the near-dup gate: every (band, key)
    * is awarded to its MINIMUM doc id (the streaming path awards it
    * to the first arrival; min-id is the batch-deterministic
    * equivalent), and a document survives iff it wins ALL its bands.
    * One groupBy on the band key + one equi-join back + one groupBy
    * on the doc — content-keyed shuffles only. Conservative by
    * construction: a random band collision between two novel docs
    * drops the larger id, exactly like the streaming gate would.
    * Returns (doc_id, n_bands, n_won, keep).
    */
  def nearDupKeepBatch(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 16, rowsPerBand: Int = 4,
                       n: Int = 3): DataFrame = {
    // batch can afford the shuffle, so signatures come from the
    // groupBy path (one min-agg pass over (id, shingle) rows) instead
    // of the row-local expression — the row-local form re-derives the
    // permuted values numHashes× per row, which the streaming gate
    // accepts to stay single-stateful-operator but a batch sweep
    // should not (measured 4× slower at sf0.1). The two signature
    // paths are proven equal in StreamingSpec. Docs shorter than n
    // tokens have no shingles and are absent (nothing to dedup).
    val sig = graft.ops.Dedup.minhashSignatureArr(
      graft.ops.Dedup.shingles(docs, idCol, textCol, n), numHashes)
    val nBands = numHashes / rowsPerBand
    // claims feeds BOTH the winners groupBy and the verdict join —
    // pin so the shingle/signature pipeline runs once (released by
    // the caller's Pins scope)
    val claims = graft.core.Pins.pin(sig.select(col("id").as("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        graft.ops.Dedup.bandKey(col("sig"), b, rowsPerBand)))
        .as(Seq("band", "key"))))
    val winners = claims.groupBy(col("band"), col("key"))
      .agg(min(col("doc_id")).as("winner"))
    claims.join(winners, Seq("band", "key"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bands"),
        sum(when(col("winner") === col("doc_id"), 1L).otherwise(0L)).as("n_won"))
      .withColumn("keep", (col("n_won") === col("n_bands")).cast("int"))
  }

  /** Approximate distinct users per hour via the `hll_est` mergeable
    * aggregate — the streaming flavor of the ES `cardinality` agg.
    * Per-window state is ONE 4096-byte register buffer (bytewise-max
    * merged across tasks and micro-batches), never a user set: the
    * state size is flat no matter how many distinct users an hour
    * holds — the property that makes windowed distinct counting
    * feasible on an unbounded stream. Batch form; identical plan for
    * readStream input via [[approxUsersHourlyStream]].
    */
  def approxUsersHourly(events: DataFrame): DataFrame =
    events.groupBy(Tables.truncNtz(col("ts"), HourUs).as("hour"))
      .agg(graft.functions.HllAgg.hll_est(col("user_id"), 11L).as("est_users"),
        count(lit(1)).as("n_events"))

  /** Streaming flavor: explicit window() + watermark (append-ready);
    * the HLL buffer IS the aggregation state in the state store.
    */
  def approxUsersHourlyStream(events: DataFrame): DataFrame =
    withEventTime(events).withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.HllAgg.hll_est(col("user_id"), 11L).as("est_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("est_users"),
        col("n_events"))

  /** Per-hour heavy-hitter users through the Misra-Gries sketch
    * aggregate ([[graft.functions.MisraGries]]): each task folds its
    * rows into a ≤ k-entry sketch per window, the shuffle moves one
    * sketch per (partition, window), and merged sketches keep the
    * N/(k+1) undercount bound. k=512 ≥ the per-hour user cardinality
    * at oracle scale, so counts are exact there; at 100 TB the same
    * plan degrades gracefully to the bounded-error regime instead of
    * blowing up state (the spec covers eviction).
    */
  def topUsersHourly(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .groupBy(Tables.truncNtz(col("ts"), HourUs).as("hour"))
      .agg(graft.functions.MisraGries.heavy_hitters(
        col("user_id").cast("string"), 512).as("hh"))
      .select(col("hour"), explode(col("hh")).as("e"))
      .select(col("hour"), col("e.term").as("term"), col("e.cnt").as("cnt"))

  /** Streaming flavor: the sketch IS the per-window aggregation state
    * in the state store — bounded at k entries per open window
    * regardless of user cardinality, and micro-batch merges follow
    * the mergeable-summaries reduction.
    */
  def topUsersHourlyStream(events: DataFrame): DataFrame =
    withEventTime(events.filter(col("user_id").isNotNull))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.MisraGries.heavy_hitters(
        col("user_id").cast("string"), 512).as("hh"))
      .select(col("window.start").as("hour"), explode(col("hh")).as("e"))
      .select(col("hour"), col("e.term").as("term"), col("e.cnt").as("cnt"))

  /** 30-minute-gap sessions per user (batch form): session boundaries
    * by lag, ids by running sum, then per-session aggregates.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val marked = events
      .withColumn("prev_us", lag(Tables.ntzMicros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          Tables.ntzMicros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(Tables.ntzMicros(col("ts"))).as("start_us"),
        max(Tables.ntzMicros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
  }
}
