package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The declared relational surface (SURVEY §2.1-2.4, §2.9): scans,
  * projections/filters, aggregations, distinct, joins, windows, set
  * ops, top-k. Each query has a DuckDB oracle; float-summing goes
  * through exact DECIMAL so results are bit-identical across engines
  * (doubles only ever see +,-,*,/ on identical operands).
  *
  * Scale notes per query are inline; the general rules: filters and
  * projections reach the parquet scan (Catalyst pushdown), small dims
  * are broadcast, group-bys get map-side partial aggregation, windows
  * are partitioned by a real key (never a global single-partition
  * window).
  */
object RelationalQueries {

  /** Exact sum of a 2-dp money column: through DECIMAL(18,s) so the
    * result is independent of addition order, then back to double.
    */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Bit-interleave written out term by term (dim `a` = even bits) —
    * the oracle twin of ops.ZOrder.mortonCol.
    */
  private def mortonSql(a: String, b: String, bits: Int): String =
    ((0 until bits).map(i => s"((($a >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"((($b >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")

  /** Shared z-key CTE over events (8-bit buckets on user and time). */
  private def zorderSql: String =
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t
       |           FROM events WHERE user_id IS NOT NULL),
       |     st AS (SELECT min(user_id) AS umn, max(user_id) AS umx,
       |                   min(t) AS tmn, max(t) AS tmx FROM e),
       |     r AS (SELECT event_id, user_id, t,
       |             (user_id - umn) * 256 // (umx - umn + 1) AS ub,
       |             (t - tmn) * 256 // (tmx - tmn + 1) AS tb
       |           FROM e CROSS JOIN st),
       |     z AS (SELECT *, ${mortonSql("ub", "tb", 8)} AS zkey FROM r)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S5 + A1: one count per table (10 parquet scans, count-star
    // is metadata-only per row group at scale).
    "q_count_tables" -> ((s, dir) => {
      Tables.all.map { t =>
        Tables.load(s, dir, t).agg(count(lit(1)).as("n"))
          .select(lit(t).as("tbl"), col("n"))
      }.reduce(_ unionAll _).orderBy("tbl")
    }),

    // S1 + P1: scan with filter + projection; both push to parquet.
    "q_scan_filter_project" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), to_date(col("l_shipdate")).as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A3: distinct values of a categorical column.
    "q_distinct_values" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment")).distinct().orderBy("c_mktsegment")
    }),

    // A2: exact distinct counts (the reference's nunique is an
    // approximate ES cardinality agg; engine is exact and documents
    // approx_count_distinct as the ES-parity mode).
    "q_nunique" -> ((s, dir) => {
      Tables.load(s, dir, "customer").agg(
        countDistinct(col("c_mktsegment")).as("n_mktsegment"),
        countDistinct(col("c_nationkey")).as("n_nationkey"))
    }),

    // §2.9 aggregation: TPC-H Q1 shape. One shuffle on the 2-key
    // group (map-side partials); decimal sums exact.
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) <= lit(java.sql.Date.valueOf("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          (dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.9 joins: TPC-H Q3 shape. Filtered customer dim is broadcast;
    // the orders⋈lineitem join shuffles on orderkey (the same key the
    // group-by uses → single exchange reused).
    "q3_join" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) < lit(java.sql.Date.valueOf("1998-01-01")))
      val li = Tables.load(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) > lit(java.sql.Date.valueOf("1998-01-01")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy("o_orderkey")
    }),

    // runtime-filter pattern: orders semi-joined to a selective
    // customer dim through a Bloom probe in the scan stage; the
    // closing exact semi-join makes the result identical to a plain
    // left-semi (what the oracle runs)
    "q_bloom_semi" -> ((s, dir) => {
      val dim = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      graft.ops.BloomPrune.semiJoin(Tables.load(s, dir, "orders"), dim,
          "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // §2.9 windows: per-customer order sequence + running spend.
    // Window is partitioned by custkey → fully parallel.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          row_number().over(w).as("order_seq"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
        .orderBy("o_custkey", "order_seq")
    }),

    // §2.9 set ops over customer activity by year.
    "q_setops" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      def ids(y: Int) =
        o.filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey").as("id")).distinct()
      val both = ids(1995).intersect(ids(1996))
        .select(lit("both").as("op"), col("id"))
      val only95 = ids(1995).except(ids(1996))
        .select(lit("only_1995").as("op"), col("id"))
      val only96 = ids(1996).except(ids(1995))
        .select(lit("only_1996").as("op"), col("id"))
      both.unionAll(only95).unionAll(only96).orderBy("op", "id")
    }),

    // L5: deterministic top-k (order + tiebreak on unique key).
    "q_topk_orders" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // grouped top-k: rank inside a partitioned window — fully parallel
    // (vs the global-sort top-k above), the shape that survives a
    // billion-group corpus.
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("o_orderpriority", "rnk")
    }),

    // JSON column handling: parse the events.props JSON payload with a
    // real JSON parser (from_json — codegen'd, scan-fused) and roll up
    // by event type. The oracle extracts the same field by regex so it
    // needs no DuckDB JSON extension; integer sums are exact on both
    // engines (BIGINT), the mean is one division on identical doubles.
    "q_events_json" -> ((s, dir) => {
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k")
      Tables.load(s, dir, "events")
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_k"))
        .orderBy("event_type")
    }),

    // §2.9 grouping sets family. Rollup/cube/grouping-sets are ONE
    // shuffle each: Spark's Expand operator replicates every input row
    // per grouping set BEFORE the exchange, partial-aggregates
    // map-side, and the grouping-id rides as part of the key — no
    // per-set re-scan, no union of aggregates. grouping() markers
    // disambiguate subtotal NULLs from data NULLs.
    "q_rollup" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity"), 2).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")),

    "q_cube" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("sum_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"))
        .orderBy("g_st", "g_pr", "o_orderstatus", "o_orderpriority")),

    "q_grouping_sets" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("sum_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"))
        .orderBy("g_st", "g_pr", "o_orderstatus", "o_orderpriority")),

    // pivot with an EXPLICIT value list (the implicit flavor runs a
    // distinct-collect pre-pass — a whole extra job at corpus scale);
    // one shuffle, k conditional aggregates evaluated map-side.
    "q_pivot" -> ((s, dir) => {
      val renames = Seq("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
        "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_notspec",
        "5-LOW" -> "p5_low")
      renames.foldLeft(
        Tables.load(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"))
          .pivot("o_orderpriority", renames.map(_._1))
          .agg(dsum(col("o_totalprice"), 2))) {
        case (df, (from, to)) => df.withColumnRenamed(from, to)
      }.orderBy("yr")
    }),

    // unpivot (melt) back to long form — pure per-row expansion
    // (Spark Expand, no shuffle beyond the feeding aggregate)
    "q_unpivot" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")),

    // interval (range) join: clicks within the hour before each
    // purchase — bin-bucketed equi-join (see RangeJoin), never the
    // per-key quadratic range predicate. Left semantics via the
    // aggregate + left-join-back; 2-dp values sum exactly in DECIMAL.
    "q_range_attrib" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"),
          col("ts").as("ts"), col("value"))
      val pairs = graft.ops.RangeJoin.intervalJoin(
        side("purchase"), side("click"), "user_id", "ts", "ts",
        window = 3600000000L, rightPayload = Seq("event_id", "value"))
      val agg = pairs.groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("r_value").cast(DecimalType(18, 2))).cast("double")
            .as("click_value"))
      side("purchase").join(agg, Seq("event_id"), "left")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("click_value"), lit(0.0)).as("click_value"))
        .orderBy("purchase_id")
    }),

    // as-of (backward) join: click→purchase attribution over the
    // events stream — one shuffle union-scan, no range-join blowup
    // (see AsofJoin). Times compare as long MICROseconds on both
    // engines: DuckDB's parquet reader truncates TIMESTAMP(NANOS) to
    // µs, so the engine truncates identically (`div`, not double /).
    "q_asof_attrib" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"),
          col("ts").as("ts"), col("value"))
      graft.ops.AsofJoin.backward(side("purchase"), side("click"),
          "user_id", "ts", "ts", Seq("event_id", "ts", "value"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"), col("r_event_id").as("click_id"),
          col("r_ts").as("click_ts"), col("r_value").as("click_value"))
        .orderBy("purchase_id")
    }),

    // tolerance-bounded as-of: last click within 30 minutes before
    // each purchase (attribution window) — same single-shuffle scan,
    // too-old matches nulled in the projection (ops.AsofJoin note)
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"),
          col("ts").as("ts"), col("value"))
      graft.ops.AsofJoin.backwardWithin(side("purchase"), side("click"),
          "user_id", "ts", "ts", Seq("event_id", "ts", "value"),
          tolerance = 1800000000L)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"), col("r_event_id").as("click_id"),
          col("r_ts").as("click_ts"), col("r_value").as("click_value"))
        .orderBy("purchase_id")
    }),

    // forward as-of: each click's NEXT purchase by the same user
    // (time-to-conversion) — the mirrored union-scan, one shuffle
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"),
          col("ts").as("ts"), col("value"))
      graft.ops.AsofJoin.forward(side("click"), side("purchase"),
          "user_id", "ts", "ts", Seq("event_id", "ts", "value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("c_ts"), col("r_event_id").as("purchase_id"),
          col("r_ts").as("p_ts"),
          (col("r_ts") - col("ts")).as("lag_us"))
        .orderBy("click_id")
    }),

    // nearest as-of: each click's closest purchase EITHER side (ties
    // to the preceding one) — both directions from ONE shuffle
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"),
          col("ts").as("ts"), col("value"))
      graft.ops.AsofJoin.nearest(side("click"), side("purchase"),
          "user_id", "ts", "ts", Seq("event_id", "ts"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("c_ts"), col("r_event_id").as("near_id"),
          col("r_ts").as("near_ts"),
          abs(col("r_ts") - col("ts")).as("dist_us"))
        .orderBy("click_id")
    }),

    // SCD2 interval build: each user's last-interaction-kind runs
    // (view/click) collapsed into [valid_from, valid_to) versions,
    // open last version — one keyed shuffle (ops.Scd2 scale note)
    "q_scd2_intervals" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull &&
          col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id"),
          col("ts").as("t"), col("event_type"))
      graft.ops.Scd2.intervals(ev, "user_id", "t", "event_type",
          tiebreak = Seq("event_id"))
        .select(col("user_id"), col("event_type").as("seg"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"))
        .orderBy("user_id", "valid_from_us")
    }),

    // SCD2 point-in-time lookup: each purchase resolved against the
    // interaction-kind version active at purchase time (backward
    // as-of on the strictly-increasing interval starts)
    "q_scd2_lookup" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
      val dim = graft.ops.Scd2.intervals(
        ev.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("event_id"),
            col("ts").as("t"), col("event_type")),
        "user_id", "t", "event_type", tiebreak = Seq("event_id"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("t"))
      graft.ops.Scd2.pointInTime(facts, dim, "user_id", "t",
          "event_type")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("t").as("p_ts"), col("r_event_type").as("seg"),
          col("r_valid_from").as("seg_from_us"))
        .orderBy("purchase_id")
    }),

    // one-pass column profiler (Deequ-style analyze): every metric
    // for every column out of ONE aggregation, melted per-row
    // (ops.Profile scale note). The 5-way exact-distinct Expand makes
    // this scan ~20× cpu-denser than a plain scan (r20 measured:
    // 2.2 execCpuS on the 3-4 open-cost-packed splits of the small
    // orders file — 0.6 s SERIAL per split), so the profile runs on a
    // session clone whose small-file split packing floor
    // (spark.sql.files.openCostInBytes, 4 MB default) drops to 256 KB
    // — cpu-granularity splits for a cpu-dense scan. Scale-inert by
    // construction: the open-cost floor only binds while the table is
    // smaller than cores × 4 MB; past that, bytesPerCore governs and
    // the clone plans the identical scan.
    "q_profile" -> ((s, dir) => {
      val prof = org.apache.spark.sql.graft.bridge.sessionClone(s)
      prof.conf.set("spark.sql.files.openCostInBytes", "262144")
      // the distinct-grid merge is equally cpu-dense (~170 ms/MB vs a
      // scan's ~3), so the clone's advisory drops to 512 KB too; at
      // corpus scale the exchange exceeds sessionParts × advisory at
      // ANY advisory and coalescing is inert either way
      prof.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "524288")
      graft.ops.Profile.summarize(Tables.load(prof, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_totalprice",
            "o_orderstatus", "o_orderpriority"))
        .orderBy("col_name", "metric")
    }),

    // declarative data-quality gate: uniqueness / completeness /
    // referential integrity / accepted values / range, one bounded
    // aggregate each, unioned into a single verdict frame
    "q_dq_checks" -> ((s, dir) => {
      import graft.ops.QualityChecks._
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val customer = Tables.load(s, dir, "customer")
      val events = Tables.load(s, dir, "events")
      // same-table scalar checks share ONE aggregation pass each
      // (QualityChecks.fused, r20): orders and lineitem were scanned
      // once per check before
      run(Seq(
        fused(orders, Seq(
          "unique_orderkey" -> uniquenessExpr(Seq("o_orderkey")),
          "accepted_orderstatus" ->
            acceptedExpr("o_orderstatus", Seq("O", "F", "P")))),
        fused(lineitem, Seq(
          "unique_lineitem_pk" ->
            uniquenessExpr(Seq("l_orderkey", "l_linenumber")),
          "range_discount" -> rangeExpr("l_discount", 0.0, 0.1))),
        completeness("complete_user_id", events, "user_id"),
        referential("ref_orders_customer", orders, "o_custkey",
          customer, "c_custkey"),
        referential("ref_lineitem_orders", lineitem, "l_orderkey",
          orders, "o_orderkey")))
        .orderBy("check_name")
    }),

    // interval-OVERLAP join: which click-sessions overlap which
    // view-sessions per user — bin-bucketed interval x interval
    // equi-join, duplicates eliminated arithmetically
    // (ops.RangeJoin.overlapJoin scale note)
    "q_overlap_sessions" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
      def sess(et: String) = graft.ops.Sessionize.sessions(
        ev.filter(col("event_type") === et)
          .select(col("user_id"), col("event_id"), col("ts").as("t")),
        "user_id", "t", gap = 86400000000L,
        valueCol = count(lit(1)), tiebreak = Seq("event_id"))
      val clicks = sess("click").select(col("user_id"),
        col("session_no").as("c_no"), col("start_t").as("c_s"),
        col("end_t").as("c_e"))
      val views = sess("view").select(col("user_id"),
        col("session_no").as("v_no"), col("start_t").as("v_s"),
        col("end_t").as("v_e"))
      graft.ops.RangeJoin.overlapJoin(clicks, views, "user_id",
          "c_s", "c_e", "v_s", "v_e", binWidth = 86400000000L,
          rightPayload = Seq("v_no"))
        .select(col("user_id"), col("c_no"), col("c_s"), col("c_e"),
          col("r_v_no").as("v_no"), col("r_v_s").as("v_s"),
          col("r_v_e").as("v_e"))
        .orderBy("user_id", "c_no", "v_no")
    }),

    // equi-width histogram of the event values: 20 bins from a 1-row
    // broadcast min/max, bin assignment scan-local, ONE count shuffle
    // (bounded at the bin count) — the profiler's distribution view
    "q_histogram" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("value")).filter(col("value").isNotNull)
      val st = broadcast(ev.agg(min(col("value")).as("mn"),
        max(col("value")).as("mx")))
      val nb = 20
      ev.crossJoin(st)
        // mx = mn (all values equal): (v-mn)/(mx-mn) is 0/0 and the
        // two engines disagree on NaN ordering (DuckDB NULL -> bin 19,
        // Spark NaN-is-largest semantics) — pin the degenerate case to
        // bin 0 explicitly, mirrored in the oracle
        .select(when(col("mx") === col("mn"), lit(0))
          .otherwise(least(floor((col("value") - col("mn")) /
              (col("mx") - col("mn")) * lit(nb.toDouble)),
            lit((nb - 1).toDouble)).cast("int")).as("bin"),
          col("mn"), col("mx"))
        .groupBy(col("bin"), col("mn"), col("mx"))
        .agg(count(lit(1)).as("n"))
        .select(col("bin"),
          round(col("mn") + col("bin").cast("double") *
            ((col("mx") - col("mn")) / lit(nb.toDouble)), 6).as("lo"),
          round(col("mn") + (col("bin").cast("double") + lit(1.0)) *
            ((col("mx") - col("mn")) / lit(nb.toDouble)), 6).as("hi"),
          col("n"))
        .orderBy("bin")
    }),

    // grouped z-score anomaly flags: per-event-type moment sketch
    // (n, Σx, Σx²) + broadcast join back — no per-group window funnel
    // (ops.Anomaly scale note); emits the flagged rows
    "q_anomaly_zscore" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      graft.ops.Anomaly.zscoreFlags(ev, "event_type", "value")
        .filter(col("is_anomaly"))
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
        .orderBy("event_id")
    }),

    // cumulative distinct users by day via the FIRST-TOUCH trick: a
    // running count of each user's first-appearance day — one
    // user-keyed groupBy (min day) + a day rollup. The prefix sum
    // runs as a broadcast triangle join over the ~30-row day table
    // (bounded by the calendar, never the corpus; avoids both the
    // quadratic per-prefix distinct AND a global single-partition
    // window)
    "q_cum_users" -> ((s, dir) => {
      val firstDay = Tables.events(s, dir)
        .filter(col("user_id").isNotNull &&
          col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("day"))
      val byDay = firstDay.groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
      byDay.join(broadcast(byDay.select(col("day").as("d2"),
          col("new_users").as("n2"))), col("d2") <= col("day"))
        .groupBy(col("day"), col("new_users"))
        .agg(sum(col("n2")).as("cum_users"))
        .orderBy("day")
    }),

    // first-order Markov transition estimation over each user's
    // time-ordered event sequence: ONE user-keyed window pass for the
    // lag, one (from, to) count shuffle, row-normalized against
    // broadcast marginals — the behavioral sequence model
    "q_markov" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val marg = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      trans.join(broadcast(marg), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("n_from").cast("double"), 6)
            .as("p"))
        .orderBy("from_type", "to_type")
    }),

    // mutual information between market segment and nation — the
    // feature-redundancy statistic from one joint-count pass
    // (ops.Drift.mutualInfoPairs note)
    "q_mutual_info" -> ((s, dir) => {
      val cn = Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_mktsegment").as("seg"), col("n_name").as("nation"))
      graft.ops.Drift.mutualInfoPairs(cn, "seg", "nation")
        .orderBy("seg", "nation")
    }),

    // CDC log compaction: keep-latest-per-key via ONE max(struct)
    // aggregate — map-side combined, no per-key window sort, the
    // upsert-log → snapshot primitive
    "q_cdc_compact" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts").as("t"), col("event_id"),
          col("event_type"), col("value"))
      ev.groupBy(col("user_id"))
        .agg(max(struct(col("t"), col("event_id"), col("event_type"),
          col("value"))).as("last"))
        .select(col("user_id"), col("last.t").as("t"),
          col("last.event_id").as("event_id"),
          col("last.event_type").as("event_type"),
          col("last.value").as("value"))
        .orderBy("user_id")
    }),

    // incremental aggregate maintenance: per-user purchase rollups
    // built from the first 25 days, then the last 5 days folded in as
    // a delta — the materialized-view upsert; oracle = full recompute
    // (ops.IncrementalAgg note)
    "q_agg_merge" -> ((s, dir) => {
      import graft.ops.IncrementalAgg._
      val cutoff = 1706140800000000L // 2024-01-25T00:00:00Z
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull &&
          col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("t"), col("value"))
      val base = build(ev.filter(col("t") < cutoff), "user_id", "value")
      val merged = merge(base, ev.filter(col("t") >= cutoff),
        "user_id", "value")
      readout(merged, "user_id").orderBy("user_id")
    }),

    // robust dispersion: per-event-type median absolute deviation —
    // two grouped exact-percentile passes (median, then median of
    // |x − med|), each one keyed shuffle; swap the k-min sketch at
    // 100 TB (FeatureScale percentile caveat)
    "q_mad" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      ev.join(med, Seq("event_type"))
        .groupBy(col("event_type"), col("med"))
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        .select(col("event_type"), col("med"), col("mad"))
        .orderBy("event_type")
    }),

    // incremental SCD2 merge: the last 5 days of interaction events
    // applied as a change batch onto the dimension built from the
    // first 25 — touched keys replay, untouched rows pass through
    // verbatim; the oracle is the FULL recompute the incremental path
    // must equal (ops.Scd2.mergeIntervals note)
    "q_scd2_merge" -> ((s, dir) => {
      val cutoff = 1706140800000000L // 2024-01-25T00:00:00Z
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull &&
          col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id"),
          col("ts").as("t"), col("event_type"))
      graft.ops.Scd2.mergeIntervals(
          ev.filter(col("t") < cutoff), ev.filter(col("t") >= cutoff),
          "user_id", "t", "event_type", tiebreak = Seq("event_id"))
        .select(col("user_id"), col("event_type").as("seg"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"))
        .orderBy("user_id", "valid_from_us")
    }),

    // batch sessionization: 30-min-gap sessions per user over the
    // event stream, one keyed shuffle for boundary + numbering +
    // per-session rollup (ops.Sessionize scale note).
    "q_sessionize" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          col("ts").as("t"), col("value"))
      graft.ops.Sessionize.sessions(ev, "user_id", "t",
          gap = 1800000000L, valueCol = dsum(col("value"), 2),
          tiebreak = Seq("event_id"))
        .select(col("user_id"), col("session_no"),
          col("start_t").as("start_us"), col("end_t").as("end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_no")
    }),

    // Z-order layout key: 8-bit bucket ranks for (user, time) from a
    // broadcast stats row, Morton-interleaved into one scan-fused
    // long — the sort key a 100 TB layout job would range-partition
    // on (ops.ZOrder scale note).
    "q_zorder" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts").as("t"))
      val st = broadcast(ev.agg(
        min(col("user_id")).as("umn"), max(col("user_id")).as("umx"),
        min(col("t")).as("tmn"), max(col("t")).as("tmx")))
      ev.crossJoin(st)
        .select(col("event_id"),
          graft.ops.ZOrder.bucketCol(col("user_id"), col("umn"),
            col("umx"), 8).as("ub"),
          graft.ops.ZOrder.bucketCol(col("t"), col("tmn"),
            col("tmx"), 8).as("tb"))
        .withColumn("zkey",
          graft.ops.ZOrder.mortonCol(Seq(col("ub"), col("tb")), 8))
        .orderBy("event_id")
    }),

    // Zone map over the z-keyed events: per-zone min/max bounds on
    // BOTH raw dimensions + row count — the data-skipping manifest a
    // planner probes to prune zones (ops.ZOrder.zoneMap).
    "q_zonemap" -> ((s, dir) => {
      val ev = Tables.eventsMicros(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts").as("t"))
      val st = broadcast(ev.agg(
        min(col("user_id")).as("umn"), max(col("user_id")).as("umx"),
        min(col("t")).as("tmn"), max(col("t")).as("tmx")))
      val keyed = ev.crossJoin(st)
        .withColumn("ub", graft.ops.ZOrder.bucketCol(col("user_id"),
          col("umn"), col("umx"), 8))
        .withColumn("tb", graft.ops.ZOrder.bucketCol(col("t"),
          col("tmn"), col("tmx"), 8))
        .withColumn("zkey",
          graft.ops.ZOrder.mortonCol(Seq(col("ub"), col("tb")), 8))
      graft.ops.ZOrder.zoneMap(keyed, col("zkey"),
          Seq("user_id", "t"), zoneBits = 8)
        .orderBy("zone")
    }),

    // §2.9 TPC-H Q5 shape: five-table star-chain with a region gate —
    // the join-ORDERING showcase. region/nation broadcast (KB dims);
    // customer⋈orders shuffles on custkey; the result joins lineitem
    // on orderkey and supplier broadcast; the local-supplier predicate
    // (c_nationkey = s_nationkey) closes at the end. Decimal revenue
    // exact.
    "q5_join_chain" -> ((s, dir) => {
      val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.load(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.load(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit(java.sql.Date.valueOf("1996-01-01")) &&
          to_date(col("o_orderdate")) < lit(java.sql.Date.valueOf("1998-01-01")))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    }),

    // §2.9 TPC-H Q17 shape: correlated scalar subquery, decorrelated
    // the way Catalyst itself would — per-key aggregate + equi-join
    // TPC-H Q4 shape: correlated EXISTS decorrelated to a LEFT SEMI
    // join with a compound (equi + inequality) condition — the semi
    // join dedups in the join operator itself, no distinct, and each
    // order flows through the shuffle once regardless of how many
    // lineitems witness it
    "q4_exists" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >=
          lit(java.sql.Date.valueOf("1997-01-01")) &&
          to_date(col("o_orderdate")) <
          lit(java.sql.Date.valueOf("1998-01-01")))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // back to the fact (one shuffle each on the SAME key, so the join
    // reuses the aggregation's exchange). Per-part mean through the
    // exact DECIMAL sum so the threshold is engine-identical.
    "q17_subquery" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val pavg = li.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(pavg, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(dsum(col("l_extendedprice"), 2).as("total_rev"),
          count(lit(1)).as("n_rows"))
    }),

    // cohort retention matrix: signup week × active week distinct
    // users — two aggregations and an equi-join on user_id, the
    // classic product-analytics rollup (no windows, no self-join)
    "q_cohort_retention" -> ((s, dir) => {
      val weeks = Tables.events(s, dir)
        .select(col("user_id"), Tables.truncNtz(col("ts"), 7L * 86400000000L,
          anchorUs = -3L * 86400000000L).as("wk"))
      val cohort = weeks.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      weeks.distinct().join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"), col("wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(Tables.ntzMicros(col("cohort_wk")).as("cohort_us"),
          Tables.ntzMicros(col("wk")).as("week_us"), col("n_users"))
        .orderBy("cohort_us", "week_us")
    }),

    // §2.9 TPC-H Q6 shape: pure filter + global agg — the pushdown
    // showcase (discount/quantity range predicates reach the parquet
    // scan as PushedFilters; only 4 columns read); decimal revenue
    // sum is order-independent and engine-exact
    "q6_filter_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
          to_date(col("l_shipdate")) < lit(java.sql.Date.valueOf("1998-01-01")) &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_rows"))),

    // grouped top-k via the bounded-heap aggregate (functions.TopKAgg):
    // each task reduces to <= k pairs BEFORE the shuffle — no per-group
    // sort anywhere, unlike the window-rank form (q_topk_per_group)
    "q_topk_agg" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.TopKAgg.top_k(
          col("c_acctbal").cast("double"), col("c_custkey"), 3).as("tk"))
        .select(col("c_mktsegment"), posexplode(col("tk")).as(Seq("r", "e")))
        .select(col("c_mktsegment"), (col("r") + 1).as("rank"),
          col("e.id").as("c_custkey"), col("e.score").as("c_acctbal"))
        .orderBy("c_mktsegment", "rank")),

    // §2.9 anti-join: lapsed customers (no order since the cutoff).
    // The filtered orders side reduces BEFORE the join; left-anti
    // shuffles on the key (or broadcasts the reduced side under AQE).
    "q_anti_join" -> ((s, dir) => {
      val recent = Tables.load(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit(java.sql.Date.valueOf("2000-09-01")))
      Tables.load(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .orderBy("c_custkey")
    }),

    // §2.9 windows: lag/lead/ntile family — per-customer order gaps
    // and the order-SEQUENCE quartile (ntile over date order).
    // Partitioned by custkey → fully parallel; all three window
    // functions share ONE sort within the partition.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_date"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_date"),
          datediff(col("o_date"), lag(col("o_date"), 1).over(w)).as("gap_days"),
          datediff(lead(col("o_date"), 1).over(w), col("o_date")).as("next_gap_days"),
          ntile(4).over(w).as("seq_quartile"))
        .orderBy("o_custkey", "o_date", "o_orderkey")
    }),

    // RANGE-frame window: per-user 1-hour trailing event count and
    // value sum at every event — the time-based rolling aggregate
    // (rangeBetween on epoch micros, not row counts). Partitioned by
    // user → fully parallel.
    "q_window_range" -> ((s, dir) => {
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-hourUs, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          Tables.ntzMicros(col("ts")).as("ts_us"),
          col("value").cast(DecimalType(18, 6)).as("v"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("v")).over(w).cast("double").as("sum_1h"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("n_1h"), round(col("sum_1h"), 6).as("sum_1h"))
        .orderBy("event_id")
    }),

    // conversion funnel over the events stream: first view → first
    // click AFTER it → first purchase AFTER that. Three chained
    // per-user window minima share ONE hash exchange (same
    // partitioning), and the closing groupBy reuses it — a whole
    // user-journey computed in a single shuffle.
    "q_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .withColumn("tv",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("tc",
          min(when(col("event_type") === "click" && col("ts") >= col("tv"),
            col("ts"))).over(w))
        .withColumn("tp",
          min(when(col("event_type") === "purchase" && col("ts") >= col("tc"),
            col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(min(col("tv")).as("tv"), min(col("tc")).as("tc"),
          min(col("tp")).as("tp"))
        .select(col("user_id"),
          Tables.ntzMicros(col("tv")).as("view_us"),
          Tables.ntzMicros(col("tc")).as("click_us"),
          Tables.ntzMicros(col("tp")).as("purchase_us"),
          when(col("tp").isNotNull, 3).when(col("tc").isNotNull, 2)
            .when(col("tv").isNotNull, 1).otherwise(0).as("stage"))
        .orderBy("user_id")
    }))

  // SCD2 run-collapse interval derivation — shared by the three SCD2
  // oracles (intervals / merge-equals-full-recompute / point-in-time
  // lookup) so their semantics can never drift apart.
  private val scd2Sql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type
      |           FROM events
      |           WHERE user_id IS NOT NULL
      |             AND event_type IN ('view', 'click')),
      |     m AS (SELECT user_id, event_id, t, event_type,
      |                  lag(event_type) OVER w AS prev,
      |                  row_number() OVER w AS rn
      |           FROM e
      |           WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |     runs AS (SELECT user_id, event_type, t, event_id FROM m
      |              WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
      |     iv AS (SELECT user_id, event_type, t AS valid_from,
      |                   lead(t) OVER (PARTITION BY user_id
      |                                 ORDER BY t, event_id) AS valid_to
      |            FROM runs)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_count_tables" ->
      Tables.all.map(t => s"SELECT '$t' AS tbl, count(*) AS n FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),

    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_distinct_values" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q_nunique" ->
      """SELECT count(DISTINCT c_mktsegment) AS n_mktsegment,
        |       count(DISTINCT c_nationkey) AS n_nationkey FROM customer""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        |GROUP BY o_orderkey, o_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_bloom_semi" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  row_number() OVER w AS order_seq,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "q_setops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey AS id FROM orders WHERE year(o_orderdate) = 1995),
        |     y96 AS (SELECT DISTINCT o_custkey AS id FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT 'both' AS op, id FROM (SELECT id FROM y95 INTERSECT SELECT id FROM y96)
        |UNION ALL
        |SELECT 'only_1995' AS op, id FROM (SELECT id FROM y95 EXCEPT SELECT id FROM y96)
        |UNION ALL
        |SELECT 'only_1996' AS op, id FROM (SELECT id FROM y96 EXCEPT SELECT id FROM y95)
        |ORDER BY op, id""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_topk_per_group" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,

    // strict top-level typed JSON extraction, mirroring Spark's
    // from_json(IntegerType): JSON integer in int range → value;
    // float / string / nested / malformed / overflow → NULL. The old
    // regexp_extract would truncate 3.7 to 3 and match a NESTED "k" —
    // latent only while the generator emits flat {"k": int}
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(CAST(sum(k) AS BIGINT) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS avg_k
        |FROM (SELECT event_type,
        |             CASE WHEN json_valid(props)
        |                   AND json_type(props, '$.k')
        |                       IN ('BIGINT', 'UBIGINT')
        |                  THEN TRY_CAST(json_extract_string(props, '$.k')
        |                                AS INT)
        |             END AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority""".stripMargin,

    "q_pivot" -> {
      val cases = Seq("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
        "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_notspec",
        "5-LOW" -> "p5_low").map { case (v, a) =>
        s"""CAST(sum(CASE WHEN o_orderpriority = '$v'
           |       THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS $a"""
          .stripMargin
      }.mkString(",\n  ")
      s"""SELECT year(o_orderdate) AS yr,
         |  $cases
         |FROM orders GROUP BY yr ORDER BY yr""".stripMargin
    },

    "q_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(count(*) AS DOUBLE) AS n_rows
        |FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM w
        |ORDER BY l_returnflag, metric""".stripMargin,

    // plain inequality left join — DuckDB is free to nested-loop it at
    // oracle scale; the engine's bin-bucketed equi-join must produce
    // the identical row set
    "q_range_attrib" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |           FROM events WHERE event_type = 'click')
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.t AS p_ts,
        |       count(c.event_id) AS n_clicks,
        |       CAST(coalesce(sum(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE)
        |         AS click_value
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.t >= p.t - 3600000000 AND c.t <= p.t
        |GROUP BY p.event_id, p.user_id, p.t
        |ORDER BY purchase_id""".stripMargin,

    // SCD2 run-collapse + lead intervals, zero-length versions dropped
    "q_scd2_intervals" ->
      (scd2Sql + """
        |SELECT user_id, event_type AS seg, valid_from AS valid_from_us,
        |       valid_to AS valid_to_us
        |FROM iv WHERE valid_to IS NULL OR valid_to > valid_from
        |ORDER BY user_id, valid_from_us""".stripMargin),

    // first-touch rollup + running sum over the day table
    "q_cum_users" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type = 'purchase'
        |           GROUP BY user_id),
        |     d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
        |SELECT day, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,

    // lag window + (from, to) counts + row-normalization
    "q_markov" ->
      """WITH seq AS (SELECT user_id, event_type,
        |               lag(event_type) OVER (PARTITION BY user_id
        |                 ORDER BY epoch_us(ts), event_id) AS from_type
        |             FROM events WHERE user_id IS NOT NULL),
        |tr AS (SELECT from_type, event_type AS to_type, count(*) AS n
        |       FROM seq WHERE from_type IS NOT NULL
        |       GROUP BY from_type, event_type),
        |mg AS (SELECT from_type, sum(n) AS n_from FROM tr GROUP BY from_type)
        |SELECT tr.from_type, tr.to_type, tr.n,
        |       round(CAST(tr.n AS DOUBLE) / CAST(mg.n_from AS DOUBLE), 6)
        |         AS p
        |FROM tr JOIN mg ON tr.from_type = mg.from_type
        |ORDER BY 1, 2""".stripMargin,

    // exact joint/marginal counts then identical-operand double MI
    "q_mutual_info" ->
      """WITH cn AS (SELECT c_mktsegment AS seg, n_name AS nation
        |            FROM customer JOIN nation
        |              ON c_nationkey = n_nationkey),
        |j AS (SELECT seg, nation, count(*) AS n_ab FROM cn
        |      WHERE seg IS NOT NULL AND nation IS NOT NULL
        |      GROUP BY seg, nation),
        |ma AS (SELECT seg, sum(n_ab) AS n_a FROM j GROUP BY seg),
        |mb AS (SELECT nation, sum(n_ab) AS n_b FROM j GROUP BY nation),
        |tot AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS n FROM j)
        |SELECT j.seg, j.nation, j.n_ab,
        |       round((CAST(j.n_ab AS DOUBLE) / tot.n)
        |             * ln(CAST(j.n_ab AS DOUBLE) * tot.n
        |                  / (CAST(ma.n_a AS DOUBLE)
        |                     * CAST(mb.n_b AS DOUBLE))), 6) AS mi_term
        |FROM j JOIN ma ON j.seg = ma.seg
        |       JOIN mb ON j.nation = mb.nation
        |       CROSS JOIN tot
        |ORDER BY 1, 2""".stripMargin,

    // rk-1 window twin of the max(struct) compaction (the struct's
    // lexicographic max IS last-by-(t, event_id))
    "q_cdc_compact" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |                  event_type, value,
        |                  row_number() OVER (PARTITION BY user_id
        |                    ORDER BY epoch_us(ts) DESC, event_id DESC)
        |                    AS rk
        |           FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, t, event_id, event_type, value
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    // full recompute over all purchases — the state the incremental
    // fold must reach
    "q_agg_merge" ->
      """SELECT user_id, count(value) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |         AS sum_value,
        |       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |         / CAST(count(value) AS DOUBLE) AS mean,
        |       min(value) AS mn, max(value) AS mx
        |FROM events
        |WHERE user_id IS NOT NULL AND event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // exact quantile parity: Spark percentile and DuckDB
    // quantile_cont share the p*(n-1) interpolation
    "q_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, m.med,
        |       quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type, m.med
        |ORDER BY event_type""".stripMargin,

    // the incremental merge must equal the FULL recompute over
    // base ∪ changes — which is exactly the q_scd2_intervals oracle
    "q_scd2_merge" ->
      (scd2Sql + """
        |SELECT user_id, event_type AS seg, valid_from AS valid_from_us,
        |       valid_to AS valid_to_us
        |FROM iv WHERE valid_to IS NULL OR valid_to > valid_from
        |ORDER BY user_id, valid_from_us""".stripMargin),

    // point-in-time: ASOF against the strictly-increasing interval
    // starts ≡ containing-interval lookup (open last version)
    "q_scd2_lookup" ->
      (scd2Sql + """,
        |     iv2 AS (SELECT * FROM iv
        |             WHERE valid_to IS NULL OR valid_to > valid_from),
        |     p AS (SELECT event_id, user_id, epoch_us(ts) AS t
        |           FROM events
        |           WHERE event_type = 'purchase' AND user_id IS NOT NULL)
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.t AS p_ts,
        |       iv2.event_type AS seg, iv2.valid_from AS seg_from_us
        |FROM p ASOF LEFT JOIN iv2
        |  ON p.user_id = iv2.user_id AND p.t >= iv2.valid_from
        |ORDER BY purchase_id""".stripMargin),

    // per-(column, metric) unions mirroring Profile.summarize's one
    // aggregation pass (identical DECIMAL-exact mean arithmetic)
    "q_profile" -> {
      def m(c: String, metric: String, e: String) =
        s"SELECT '$c' AS col_name, '$metric' AS metric, " +
          s"CAST($e AS DOUBLE) AS value FROM orders"
      def base(c: String) = Seq(
        m(c, "n", s"count($c)"),
        m(c, "nulls", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"),
        m(c, "distinct", s"count(DISTINCT $c)"))
      val num = Seq("o_orderkey", "o_custkey", "o_totalprice").flatMap {
        c => base(c) ++ Seq(
          m(c, "min", s"min($c)"), m(c, "max", s"max($c)"),
          // VARCHAR route: DuckDB's direct DECIMAL->DOUBLE double-rounds
          // past ~2^53 (sum(o_totalprice) at sf0.1 is 3.75e16 scaled
          // units) while Spark's BigDecimal->double rounds correctly
          m(c, "mean", s"CAST(CAST(sum(CAST($c AS DECIMAL(38,6)))" +
            s" AS VARCHAR) AS DOUBLE) / CAST(count($c) AS DOUBLE)"))
      }
      val str = Seq("o_orderstatus", "o_orderpriority").flatMap {
        c => base(c) ++ Seq(
          m(c, "min_len", s"min(length($c))"),
          m(c, "max_len", s"max(length($c))"))
      }
      (num ++ str).mkString("", "\nUNION ALL\n",
        "\nORDER BY col_name, metric")
    },

    // one scalar subquery per check, unioned — the oracle twin of
    // QualityChecks.run
    "q_dq_checks" ->
      """SELECT 'accepted_orderstatus' AS check_name,
        |       CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |                 AND o_orderstatus NOT IN ('O','F','P')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders
        |UNION ALL
        |SELECT 'complete_user_id',
        |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) FROM events
        |UNION ALL
        |SELECT 'range_discount',
        |       CAST(sum(CASE WHEN l_discount IS NOT NULL
        |                 AND (l_discount < 0.0 OR l_discount > 0.1)
        |                THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'ref_lineitem_orders', count(*)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'ref_orders_customer', count(*)
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
        |UNION ALL
        |SELECT 'unique_lineitem_pk',
        |       count(CASE WHEN l_orderkey IS NOT NULL
        |                   AND l_linenumber IS NOT NULL THEN 1 END)
        |       - count(DISTINCT CASE WHEN l_orderkey IS NOT NULL
        |                              AND l_linenumber IS NOT NULL
        |                             THEN (l_orderkey, l_linenumber) END)
        |FROM lineitem
        |UNION ALL
        |SELECT 'unique_orderkey',
        |       count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
        |ORDER BY check_name""".stripMargin,

    // identical bin arithmetic: (v-mn)/(mx-mn)*20 floored, top edge
    // clamped into the last bin
    "q_histogram" ->
      """WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(value) AS mn, max(value) AS mx FROM v),
        |b AS (SELECT CASE WHEN mx = mn THEN 0
        |                  ELSE CAST(least(floor((value - mn) / (mx - mn)
        |                                        * CAST(20 AS DOUBLE)),
        |                                  CAST(19 AS DOUBLE)) AS INT)
        |             END AS bin,
        |             mn, mx
        |      FROM v CROSS JOIN st)
        |SELECT bin,
        |       round(mn + CAST(bin AS DOUBLE)
        |             * ((mx - mn) / CAST(20 AS DOUBLE)), 6) AS lo,
        |       round(mn + (CAST(bin AS DOUBLE) + CAST(1 AS DOUBLE))
        |             * ((mx - mn) / CAST(20 AS DOUBLE)), 6) AS hi,
        |       count(*) AS n
        |FROM b GROUP BY bin, mn, mx ORDER BY bin""".stripMargin,

    // same moment-sketch shapes as ops.Anomaly: DECIMAL-exact sums,
    // identical-operand double z, variance-guarded CASE (NaN would
    // compare above the threshold in both engines)
    "q_anomaly_zscore" ->
      """WITH st AS (SELECT event_type,
        |    CAST(count(value) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(30,12))) AS VARCHAR)
        |         AS DOUBLE) AS s,
        |    CAST(CAST(sum(CAST(value*value AS DECIMAL(38,12))) AS VARCHAR)
        |         AS DOUBLE) AS sq
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, e.value, z FROM (
        |  SELECT e.event_id, e.event_type, e.value,
        |         CASE WHEN sq/n - (s/n)*(s/n) > 0
        |              THEN (e.value - s/n) / sqrt(sq/n - (s/n)*(s/n))
        |         END AS z
        |  FROM events e JOIN st USING (event_type)) e
        |WHERE abs(z) > CAST(3 AS DOUBLE)
        |ORDER BY event_id""".stripMargin,

    // native ASOF + CASE null-out beyond the window — the "latest
    // overall, nulled when too old" identity the engine relies on
    "q_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |           FROM events WHERE event_type = 'purchase'),
        |     c0 AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |            FROM events
        |            WHERE event_type = 'click' AND user_id IS NOT NULL),
        |     c AS (SELECT user_id, t, max(event_id) AS event_id,
        |                  arg_max(value, event_id) AS value
        |           FROM c0 GROUP BY user_id, t)
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.t AS p_ts,
        |       CASE WHEN p.t - c.t <= 1800000000 THEN c.event_id END AS click_id,
        |       CASE WHEN p.t - c.t <= 1800000000 THEN c.t END AS click_ts,
        |       CASE WHEN p.t - c.t <= 1800000000 THEN c.value END AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
        |ORDER BY purchase_id""".stripMargin,

    // DuckDB's native ASOF JOIN is the oracle for the union-scan
    // implementation; p.t >= c.t matches the inclusive tie semantics.
    // The c2 GROUP BY mirrors the engine's deterministic collapse of
    // right rows tied on (key, time) — the payload struct's first
    // field is the unique event_id, so max struct == arg_max(event_id)
    "q_asof_attrib" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |           FROM events WHERE event_type = 'purchase'),
        |     c0 AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |            FROM events
        |            WHERE event_type = 'click' AND user_id IS NOT NULL),
        |     c AS (SELECT user_id, t, max(event_id) AS event_id,
        |                  arg_max(value, event_id) AS value
        |           FROM c0 GROUP BY user_id, t)
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.t AS p_ts,
        |       c.event_id AS click_id, c.t AS click_ts, c.value AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
        |ORDER BY purchase_id""".stripMargin,

    "q_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t
        |           FROM events WHERE event_type = 'click'),
        |     p0 AS (SELECT event_id, user_id, epoch_us(ts) AS t
        |            FROM events
        |            WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |     p AS (SELECT user_id, t, max(event_id) AS event_id
        |           FROM p0 GROUP BY user_id, t),
        |     b AS (SELECT c.event_id AS click_id, c.user_id AS user_id,
        |                  c.t AS c_ts, p.event_id AS b_id, p.t AS b_ts
        |           FROM c ASOF LEFT JOIN p
        |             ON c.user_id = p.user_id AND c.t >= p.t),
        |     f AS (SELECT c.event_id AS click_id, p.event_id AS f_id,
        |                  p.t AS f_ts
        |           FROM c ASOF LEFT JOIN p
        |             ON c.user_id = p.user_id AND c.t < p.t)
        |SELECT b.click_id AS click_id, b.user_id AS user_id, b.c_ts AS c_ts,
        |       CASE WHEN b_id IS NULL THEN f_id
        |            WHEN f_id IS NULL THEN b_id
        |            WHEN c_ts - b_ts <= f_ts - c_ts THEN b_id
        |            ELSE f_id END AS near_id,
        |       CASE WHEN b_id IS NULL THEN f_ts
        |            WHEN f_id IS NULL THEN b_ts
        |            WHEN c_ts - b_ts <= f_ts - c_ts THEN b_ts
        |            ELSE f_ts END AS near_ts,
        |       abs(CASE WHEN b_id IS NULL THEN f_ts
        |                WHEN f_id IS NULL THEN b_ts
        |                WHEN c_ts - b_ts <= f_ts - c_ts THEN b_ts
        |                ELSE f_ts END - c_ts) AS dist_us
        |FROM b JOIN f USING (click_id)
        |ORDER BY click_id""".stripMargin,

    "q_zorder" ->
      s"""$zorderSql
         |SELECT event_id, ub, tb, zkey FROM z ORDER BY event_id""".stripMargin,

    "q_zonemap" ->
      s"""$zorderSql
         |SELECT zkey >> 8 AS zone, count(*) AS n_rows,
         |       min(user_id) AS user_id_min, max(user_id) AS user_id_max,
         |       min(t) AS t_min, max(t) AS t_max
         |FROM z GROUP BY zone ORDER BY zone""".stripMargin,

    // plain inequality overlap join over the windowed session CTEs —
    // DuckDB may nested-loop it at oracle scale; the engine's
    // bin-bucketed equi-join must produce the identical pair set
    "q_overlap_sessions" -> {
      def sess(et: String, n: String) =
        s"""${n}0 AS (SELECT user_id, event_id, epoch_us(ts) AS t
           |       FROM events
           |       WHERE user_id IS NOT NULL AND event_type = '$et'),
           |${n}1 AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
           |                        OR t - lag(t) OVER w > 86400000000
           |                   THEN 1 ELSE 0 END AS nb
           |       FROM ${n}0
           |       WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
           |${n}2 AS (SELECT *, CAST(sum(nb) OVER
           |         (PARTITION BY user_id ORDER BY t, event_id)
           |         AS BIGINT) AS sn
           |       FROM ${n}1),
           |$n AS (SELECT user_id, sn, min(t) AS s, max(t) AS e
           |       FROM ${n}2 GROUP BY user_id, sn)""".stripMargin
      s"""WITH ${sess("click", "c")},
         |${sess("view", "v")}
         |SELECT c.user_id AS user_id, c.sn AS c_no, c.s AS c_s, c.e AS c_e,
         |       v.sn AS v_no, v.s AS v_s, v.e AS v_e
         |FROM c JOIN v ON c.user_id = v.user_id
         |  AND c.s <= v.e AND v.s <= c.e
         |ORDER BY user_id, c_no, v_no""".stripMargin
    },

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value
        |           FROM events WHERE user_id IS NOT NULL),
        |     b AS (SELECT *,
        |             CASE WHEN lag(t) OVER w IS NULL
        |                    OR t - lag(t) OVER w > 1800000000
        |                  THEN 1 ELSE 0 END AS nb
        |           FROM e
        |           WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |     s AS (SELECT *, CAST(sum(nb) OVER
        |             (PARTITION BY user_id ORDER BY t, event_id)
        |             AS BIGINT) AS session_no
        |           FROM b)
        |SELECT user_id, session_no, min(t) AS start_us, max(t) AS end_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "q_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |           FROM events WHERE event_type = 'click'),
        |     p0 AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |            FROM events
        |            WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |     p AS (SELECT user_id, t, max(event_id) AS event_id,
        |                  arg_max(value, event_id) AS value
        |           FROM p0 GROUP BY user_id, t)
        |SELECT c.event_id AS click_id, c.user_id AS user_id, c.t AS c_ts,
        |       p.event_id AS purchase_id, p.t AS p_ts, p.t - c.t AS lag_us
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t <= p.t
        |ORDER BY click_id""".stripMargin,

    // the correlated original — DuckDB decorrelates it itself; the
    // engine's explicit semi join must produce the identical counts
    "q4_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // decorrelated form with the identical DECIMAL-mean arithmetic
    "q17_subquery" ->
      """WITH pa AS (SELECT l_partkey,
        |  0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(*)) AS half_avg
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_rev,
        |       count(*) AS n_rows
        |FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
        |WHERE l.l_quantity < pa.half_avg""".stripMargin,

    "q5_join_chain" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |             AND s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id,
        |                  date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        |           FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
        |d AS (SELECT DISTINCT user_id, wk FROM e)
        |SELECT epoch_us(cohort_wk) AS cohort_us, epoch_us(wk) AS week_us,
        |       count(DISTINCT d.user_id) AS n_users
        |FROM d JOIN c ON d.user_id = c.user_id
        |GROUP BY cohort_wk, wk ORDER BY cohort_us, week_us""".stripMargin,

    "q6_filter_agg" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |         AS DOUBLE) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24""".stripMargin,

    // identical total order (acctbal DESC, custkey) as TopKAgg
    "q_topk_agg" ->
      """SELECT c_mktsegment, CAST(rnk AS INT) AS rank, c_custkey,
        |       CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |             row_number() OVER (PARTITION BY c_mktsegment
        |               ORDER BY CAST(c_acctbal AS DOUBLE) DESC, c_custkey)
        |               AS rnk
        |      FROM customer)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rank""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND CAST(o.o_orderdate AS DATE) >= DATE '2000-09-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_window_lag" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(o_orderdate AS DATE) AS o_date FROM orders)
        |SELECT o_custkey, o_orderkey, o_date,
        |  CAST(date_diff('day',
        |    lag(o_date, 1) OVER (PARTITION BY o_custkey ORDER BY o_date, o_orderkey),
        |    o_date) AS INT) AS gap_days,
        |  CAST(date_diff('day', o_date,
        |    lead(o_date, 1) OVER (PARTITION BY o_custkey ORDER BY o_date, o_orderkey))
        |    AS INT) AS next_gap_days,
        |  ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_date, o_orderkey)
        |    AS seq_quartile
        |FROM o ORDER BY o_custkey, o_date, o_orderkey""".stripMargin,

    "q_window_range" ->
      """WITH e AS (SELECT event_id, user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  CAST(value AS DECIMAL(18,6)) AS v FROM events)
        |SELECT event_id, user_id, ts_us,
        |       count(*) OVER w AS n_1h,
        |       round(CAST(sum(v) OVER w AS DOUBLE), 6) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |               OVER (PARTITION BY user_id) AS tv FROM e),
        |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= tv
        |                         THEN ts END)
        |               OVER (PARTITION BY user_id) AS tc FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= tc
        |                         THEN ts END)
        |               OVER (PARTITION BY user_id) AS tp FROM b)
        |SELECT user_id,
        |       epoch_us(min(tv)) AS view_us,
        |       epoch_us(min(tc)) AS click_us,
        |       epoch_us(min(tp)) AS purchase_us,
        |       CASE WHEN min(tp) IS NOT NULL THEN 3
        |            WHEN min(tc) IS NOT NULL THEN 2
        |            WHEN min(tv) IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)
}
