package graft.queries

import graft.core.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming semantics in batch form, oracle-checked: tumbling-window
  * aggregation and gap sessionization over `events`. Timestamps are
  * compared as epoch micros (BIGINT) for engine-neutral hashing;
  * value sums go through DECIMAL(30,12) so they are exact.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> ((s, dir) =>
      StreamingOps.tumblingHourly(Tables.events(s, dir))
        .select(Tables.ntzMicros(col("hour")).as("hour_us"), col("event_type"),
          col("n"), round(col("sum_value"), 6).as("sum_value"))
        .orderBy("hour_us", "event_type")),

    "q_stream_sessions" -> ((s, dir) =>
      StreamingOps.sessionize(Tables.events(s, dir), 30)
        .orderBy("user_id", "session_id")),

    // sliding 1h windows every 15min (each event in 4 windows)
    "q_stream_sliding" -> ((s, dir) =>
      StreamingOps.slidingHourly(Tables.events(s, dir))
        .select(Tables.ntzMicros(col("wstart")).as("wstart_us"), col("event_type"),
          col("n"), round(col("sum_value"), 6).as("sum_value"))
        .orderBy("wstart_us", "event_type")),

    // batch semantics of the stream-stream interval join (StreamingSpec
    // proves the watermarked readStream flavor emits the same rows):
    // purchases within 30min after a click by the same user
    "q_stream_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      StreamingOps.intervalJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "user_id", gapUs = 1800000000L)
        .orderBy("l_id", "r_id")
    }),

    // batch semantics of the flatMapGroupsWithState running totals
    // (StreamingSpec proves the stateful streaming flavor converges to
    // exactly this across micro-batches)
    "q_stream_user_totals" -> ((s, dir) =>
      StreamingOps.userTotals(Tables.events(s, dir))
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy("user_id")),

    // windowed approximate distinct (hll_est aggregate): per-hour
    // user cardinality from a flat 4096-byte register state — the
    // streaming ES-cardinality shape; the oracle replays the registers
    // per hour and StreamingSpec proves the readStream flavor emits
    // identical rows
    "q_stream_hll" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      StreamingOps.approxUsersHourly(ev)
        .join(ev.select(Tables.truncNtz(col("ts"), 3600000000L).as("hour"),
            col("user_id")).distinct()
          .groupBy(col("hour")).agg(count(lit(1)).as("exact_users")),
          Seq("hour"))
        .select(Tables.ntzMicros(col("hour")).as("hour_us"), col("est_users"),
          col("exact_users"), col("n_events"))
        .orderBy("hour_us")
    }),

    // windowed heavy hitters (Misra-Gries aggregate): per-hour top
    // users from a <=k-entry sketch per window; k=512 >= the hourly
    // user cardinality at oracle scale, so the sketch never evicts
    // and the counts hash-match the exact GROUP BY (the approximation
    // regime is spec-tested; StreamingSpec proves micro-batch merge)
    "q_stream_hh" -> ((s, dir) =>
      StreamingOps.topUsersHourly(Tables.events(s, dir))
        .select(Tables.ntzMicros(col("hour")).as("hour_us"), col("term"),
          col("cnt"))
        .orderBy("hour_us", "term")))

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |       event_type, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,

    // each event expands to its 4 containing sliding windows:
    // start = (floor(us / slide) - i) * slide, i = 0..3 (size/slide = 4)
    "q_stream_sliding" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
        |           FROM events),
        |x AS (SELECT us, event_type, value,
        |             ((us // 900000000) - i.i) * 900000000 AS wstart_us
        |      FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i)
        |SELECT wstart_us, event_type, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 6) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY wstart_us, event_type""".stripMargin,

    "q_stream_join" ->
      """WITH c AS (SELECT user_id, event_id AS l_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS l_us
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS r_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS r_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id AS user_id, l_id, r_id, r_us - l_us AS gap_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |WHERE r_us >= l_us AND r_us - l_us <= 1800000000
        |ORDER BY l_id, r_id""".stripMargin,

    "q_stream_user_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 6) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // per-hour HLL registers replayed exactly (same md5-hash60 +
    // exact-BIGINT register sum + linear-counting branch as
    // q_sketch_hll, keyed by the hour window)
    "q_stream_hll" -> {
      import graft.ops.Sketches
      s"""WITH hu AS (SELECT DISTINCT
         |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, user_id
         |  FROM events),
         |h AS (SELECT hour,
         |    ('0x' || substr(md5('11:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM hu WHERE user_id IS NOT NULL),
         |b AS (SELECT hour, h % 4096 AS bucket, h // 4096 AS w FROM h),
         |r AS (SELECT hour, bucket,
         |        max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS r
         |      FROM b GROUP BY 1, 2),
         |est AS (SELECT hour, count(*) AS nonempty,
         |          CAST(sum(1::BIGINT << (49 - r))
         |               + (4096 - count(*)) * (1::BIGINT << 49) AS BIGINT) AS s_num
         |        FROM r GROUP BY 1),
         |o AS (SELECT hour,
         |        CASE WHEN 4096 - nonempty > 0
         |                  AND ${Sketches.HllNum} / CAST(s_num AS DOUBLE)
         |                      <= ${2.5 * Sketches.HllM}
         |             THEN round(4096.0 * ln(4096.0 /
         |                    CAST(4096 - nonempty AS DOUBLE)), 4)
         |             ELSE round(${Sketches.HllNum} / CAST(s_num AS DOUBLE), 4)
         |        END AS est_users
         |      FROM est),
         |ex AS (SELECT hour, count(*) AS exact_users FROM hu GROUP BY 1),
         |ne AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         |              count(*) AS n_events
         |       FROM events GROUP BY 1)
         |SELECT epoch_us(ne.hour) AS hour_us,
         |       coalesce(o.est_users, 0.0) AS est_users,
         |       ex.exact_users, ne.n_events
         |FROM ne JOIN ex USING (hour) LEFT JOIN o USING (hour)
         |ORDER BY hour_us""".stripMargin
    },

    "q_stream_sessions" ->
      """WITH m AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)),
        |s AS (
        |  SELECT user_id, event_id, us,
        |         CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY user_id ORDER BY us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS session_id
        |  FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(us) AS start_us, max(us) AS end_us,
        |       max(us) - min(us) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // exact regime: k >= per-hour user cardinality, so the sketch's
    // counts equal the plain GROUP BY
    "q_stream_hh" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |       CAST(user_id AS VARCHAR) AS term, count(*) AS cnt
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1, 2 ORDER BY hour_us, term""".stripMargin)
}
