package graft.queries

import graft.core.Tables
import graft.sources.Sink
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The bucketed sink ON the measured path (SURVEY §2.1 S4; VERDICT r9
  * item 7): `q_q5join_bucketed` runs a q5-shape fact⋈fact revenue
  * rollup over orders+lineitem REWRITTEN as co-bucketed tables
  * (`Sink.writeBucketed`, same bucket count on the join key both
  * sides), `q_q5join_shuffled` runs the identical query over the
  * plain parquet — so every bench round records the zero-Exchange
  * delta, and the gate hash-proves the layout changes NOTHING about
  * the results (both oracles are the same SQL over the same rows).
  *
  * 100-TB shape: a fact⋈fact join on the hottest key is THE shuffle
  * at corpus scale — co-bucketing pays the exchange once at write
  * time and every subsequent join reads bucket file pairs locally
  * (SortMergeJoin with zero Exchange below it, asserted in PlanSpec).
  * The `merge` hint pins the sort-merge path at test SFs where AQE
  * would broadcast the small side; at production scale the planner
  * picks it unhinted.
  */
object SinkQueries {

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // (session, dir) -> (ordersTable, lineitemTable). Writing the layout
  // is per-session setup (the cold bench run pays it once; warm runs
  // measure the join itself, which is the number that matters — a
  // bucketed table is written once and joined many times). Weak keys:
  // values are table-name strings, no session back-reference.
  private val written =
    new java.util.WeakHashMap[SparkSession, SessionTables]()

  // graft_bkt_* temp dirs live for the session (warm runs re-read
  // them); one JVM shutdown hook reaps them all so repeated driver
  // runs don't accumulate dead layouts in the system temp dir.
  private val tempDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  private lazy val cleanupHook: Unit =
    sys.addShutdownHook {
      tempDirs.forEach { p =>
        try {
          import java.nio.file.{Files, Path}
          import java.util.Comparator
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
          finally walk.close()
        } catch { case _: Exception => () } // best-effort reap
      }
    }
  private def registerCleanup(p: java.nio.file.Path): Unit = {
    cleanupHook
    tempDirs.add(p)
  }

  /** Ensure the co-bucketed orders/lineitem tables exist for (session,
    * dir); returns their catalog names. Only the query's columns are
    * written (the layout is an INDEX for this workload, not a copy of
    * the table).
    */
  // (sessionTag, dir -> tables): the random 8-hex sessionTag is minted
  // once per session so two DISTINCT sessions sharing one external
  // catalog never overwrite each other's live tables (an ordinal-only
  // tag would make both produce "0_<hash>" and the second overwrite
  // saveAsTable would clobber the first's layout).
  private final case class SessionTables(
      tag: String,
      byDir: scala.collection.mutable.Map[String, (String, String)])

  def bucketedTables(spark: SparkSession, dir: String): (String, String) =
    written.synchronized {
      val st = {
        val cur = written.get(spark)
        if (cur != null) cur
        else {
          val s = SessionTables(
            java.util.UUID.randomUUID().toString.replace("-", "").take(8),
            scala.collection.mutable.Map.empty)
          written.put(spark, s)
          s
        }
      }
      val perSession = st.byDir
      perSession.getOrElseUpdate(dir, {
        // per-session ordinal first (two dirs in ONE session can never
        // collide into one catalog table name — a bare hash could, and
        // would silently serve one dir's rows for the other's query);
        // the dir hash discriminates dirs across cloned sessions
        val tag = s"${st.tag}_${perSession.size}_" +
          java.lang.Integer.toHexString(dir.hashCode)
        val (ot, lt) = (s"orders_bkt_$tag", s"lineitem_bkt_$tag")
        val base = java.nio.file.Files.createTempDirectory("graft_bkt_")
        registerCleanup(base)
        Sink.writeBucketed(
          Tables.load(spark, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          ot, Seq("o_orderkey"), numBuckets = 16,
          path = Some(s"$base/$ot"))
        Sink.writeBucketed(
          Tables.load(spark, dir, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice"),
              col("l_discount")),
          lt, Seq("l_orderkey"), numBuckets = 16,
          path = Some(s"$base/$lt"))
        (ot, lt)
      })
    }

  // ---- materialized-rn ingest layout (StableOrder's 100-TB path) ----
  // Per (session, dir): the churn view numbered ONCE at ingest
  // (StableOrder.materializeRowNumber) into a temp parquet layout;
  // value = (path, totalRows). The split twins below read it back and
  // filter on rn — same oracles as the on-the-fly q_split_train/test
  // (the LAYOUT must change nothing about the results), while the scan
  // side is a pushed-down rn filter over row groups with tight
  // disjoint rn stats (pruning pinned in StableOrderIngestSpec).
  // Same memo rules as `written` above: WEAK session keys, values
  // carry no session back-reference (path string + count only), and
  // the lock spans the materialization — gate runners execute queries
  // sequentially, so serializing the once-per-(session,dir) write is
  // simpler than a per-key guard and can never double-write.
  private val rnMat =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, (String, Long)]]()

  private def materializedChurn(spark: SparkSession,
                                dir: String): (String, Long) =
    rnMat.synchronized {
      val perSession = {
        val cur = rnMat.get(spark)
        if (cur != null) cur
        else {
          val m = scala.collection.mutable.Map.empty[String, (String, Long)]
          rnMat.put(spark, m)
          m
        }
      }
      perSession.getOrElseUpdate(dir, {
        val base = java.nio.file.Files.createTempDirectory("graft_rnmat_")
        registerCleanup(base)
        val path = s"$base/churn_rn"
        val total = graft.core.StableOrder.materializeRowNumber(
          graft.surv.ChurnView.build(spark, dir), Seq(col("id")), path)
        (path, total)
      })
    }

  // floor(n * 0.9) — the ONE train-boundary rule for the mat twins,
  // same arithmetic as SurvDataset.trainLen at the gate's fixed 0.9
  // ratio and as the oracle splitSql's floor(count(*) * 0.9): all
  // three must move together or the twins silently diverge
  private def matTrainLen(total: Long): Long = (total * 0.9).toLong

  private def matSplit(spark: SparkSession, dir: String,
                       train: Boolean): DataFrame = {
    val (path, total) = materializedChurn(spark, dir)
    val trainLen = matTrainLen(total)
    val pred =
      if (train) col(graft.core.StableOrder.RN) < trainLen
      else col(graft.core.StableOrder.RN) >= trainLen
    spark.read.parquet(path).filter(pred)
      .select(col("id"), col("t"), col("e"), col(graft.core.StableOrder.RN))
      .orderBy("id")
  }

  /** Revenue by order priority over (lineitem ⋈ orders) — the shared
    * query body; only the input layout differs between the twins.
    */
  private def q5Shape(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_q5join_bucketed" -> ((s, dir) => {
      val (ot, lt) = bucketedTables(s, dir)
      q5Shape(s.table(lt), s.table(ot))
    }),

    "q_q5join_shuffled" -> ((s, dir) =>
      q5Shape(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount")),
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")))),

    // L1/L2 over the MATERIALIZED-rn ingest layout: the split is a
    // pushed-down data filter on a column with tight disjoint
    // row-group stats — zero shuffle, zero counts job at query time.
    // Same oracles as the on-the-fly twins: layout changes nothing.
    "q_split_train_mat" -> ((s, dir) => matSplit(s, dir, train = true)),
    "q_split_test_mat" -> ((s, dir) => matSplit(s, dir, train = false)),

    // L3 over the same layout: the cursor window [256, 320) of the
    // train split as a pushed-down rn range — at scale this reads
    // exactly the row groups covering 64 rows, wherever they sit in
    // a 100-TB corpus. Same oracle as on-the-fly q_batch_window.
    "q_batch_window_mat" -> ((s, dir) => {
      val (path, total) = materializedChurn(s, dir)
      val rn = col(graft.core.StableOrder.RN)
      s.read.parquet(path)
        .filter(rn < matTrainLen(total) && rn >= 256 && rn < 320)
        .select(col("id"), rn, col("t"), col("e")).orderBy("id")
    }))

  // identical SQL for both twins: the layout must not change results.
  // VARCHAR-route cast on the unrounded decimal sum: DuckDB's direct
  // DECIMAL→DOUBLE double-rounds (int128→double, then /10^scale) and
  // diverges from Spark's correctly-rounded BigDecimal→double in the
  // last ulp past ~15 significant digits — per-priority revenue
  // crosses that at sf1, exactly the scale this pair rehearses
  // (round-9 postmortem rule; the z-score oracle hit the same seam)
  private val q5Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount)
      |    AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // the mat twins share the on-the-fly twins' oracles BY REFERENCE —
  // the "layout changes nothing" proof depends on both sides of each
  // pair comparing against the SAME SQL, and a re-derived copy would
  // silently decouple on the next edit
  val oracles: Map[String, String] = Map(
    "q_q5join_bucketed" -> q5Sql,
    "q_q5join_shuffled" -> q5Sql,
    "q_split_train_mat" -> SurvQueries.oracles("q_split_train"),
    "q_split_test_mat" -> SurvQueries.oracles("q_split_test"),
    "q_batch_window_mat" -> SurvQueries.oracles("q_batch_window"))
}
