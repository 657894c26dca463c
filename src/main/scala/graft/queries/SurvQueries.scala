package graft.queries

import graft.surv.{ChurnView, DurationCuts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The survival data layer as oracle-checkable queries (SURVEY
  * §2.2-2.5): the churn survival view, stable ordered 90/10 splits,
  * batch windows, feature inference, one-hot encoding, and duration
  * discretization. These pin the reference's quirky split/encode
  * semantics (head/tail ordered split, sklearn-sorted categories,
  * train-fitted equidistant cuts) against DuckDB SQL.
  */
object SurvQueries {

  private val C = ChurnView.sql // churn + churn_rn CTEs

  // shared with SinkQueries' materialized-rn split twins
  private[queries] val splitSql =
    """tl AS (SELECT CAST(floor(count(*) * CAST(0.9 AS DOUBLE)) AS BIGINT)
      |          AS train_len FROM churn)""".stripMargin

  /** Expected encoded feature list — written out literally so the
    * oracle stays independent of the engine's fit.
    */
  private val expectedFeatures: Seq[String] =
    Seq("c_acctbal") ++
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        .map(v => s"c_mktsegment_$v") ++
      (0 until 25).map(i => s"NATION_$i").sorted.map(v => s"n_name_$v") ++
      Seq("n_orders", "total_spent")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The survival view itself (joins + group-by + global-max cross).
    "q_churn_view" -> ((s, dir) =>
      ChurnView.build(s, dir).orderBy("id")),

    // L1: ordered head split (first 90% in stable id order).
    "q_split_train" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      ds.train.select(col("id"), col("t"), col("e"), col("rn")).orderBy("id")
    }),

    // L2: ordered tail split (last 10%).
    "q_split_test" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      ds.test.select(col("id"), col("t"), col("e"), col("rn")).orderBy("id")
    }),

    // L3: batch window [256, 320) of the train split in stable order.
    "q_batch_window" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      ds.batch(ds.train, 256, 64)
        .select(col("id"), col("rn"), col("t"), col("e")).orderBy("id")
    }),

    // P2 + E3: inferred encoded feature list (sorted setdiff,
    // in-place one-hot expansion).
    "q_feature_names" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      import s.implicits._
      ds.encodedFeatures.zipWithIndex.toDF("feature", "pos").orderBy("pos")
    }),

    // E1/E2: one-hot of c_mktsegment (sorted categories, 0/1 ints).
    "q_onehot_mktsegment" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val spec = ds.oneHot.find(_.column == "c_mktsegment").get
      ds.df.select(col("id") +: spec.exprs: _*).orderBy("id")
    }),

    // E4: duration cuts fitted on TRAIN, bucketize applied to all.
    "q_label_discretize" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", 10)
      ds.df.select(col("id"), col("t"), cuts.indexCol(col("t")).as("t_idx"))
        .orderBy("id")
    }),

    // E4 pycox flavor: same cuts, event flag administratively censored
    // for rows beyond the fitted grid (LabTransDiscreteTime semantics).
    "q_label_discretize_pycox" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", 10)
      ds.df.select(col("id"), col("t"), cuts.indexCol(col("t")).as("t_idx"),
          cuts.eventColPycox(col("t"), col("e")).as("e_adm"))
        .orderBy("id")
    }),

    // Feature scaling trio (z-score / min-max / robust) over the
    // customer balance: one stats pass, broadcast transform
    // (ops.FeatureScale scale note).
    "q_feature_scale" -> ((s, dir) => {
      val cust = graft.core.Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      graft.ops.FeatureScale.scaled(cust, Seq(("c_acctbal", 2)))
        .select(col("c_custkey"), col("c_acctbal_z").as("z_bal"),
          col("c_acctbal_mm").as("mm_bal"), col("c_acctbal_rb").as("rb_bal"))
        .orderBy("c_custkey")
    }),

    // E5: tensorized batch, exploded to long form (rn, idx, xval, t, e)
    // — the raw array<float> column is hash-equivalent but the driver's
    // pandas sort can't order ndarray cells, so the oracle check needs
    // one scalar row per vector entry.
    "q_tensorize" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      ds.tensorized(ds.train)
        .select(col("rn"), posexplode(col("x")).as(Seq("idx", "xval")),
          col("t"), col("e"))
        .orderBy("rn", "idx")
    }))

  val oracles: Map[String, String] = Map(
    "q_churn_view" -> (C + "SELECT * FROM churn ORDER BY id"),

    // same arithmetic shapes as FeatureScale.scaled: DECIMAL-exact
    // sums cast to double, then identical-operand double expressions
    "q_feature_scale" ->
      """WITH st AS (SELECT
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(c_acctbal*c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |      AS sq,
        |    min(c_acctbal) AS mn, max(c_acctbal) AS mx,
        |    quantile_cont(c_acctbal, 0.25) AS q1,
        |    quantile_cont(c_acctbal, 0.5) AS med,
        |    quantile_cont(c_acctbal, 0.75) AS q3
        |  FROM customer)
        |SELECT c_custkey,
        |       (c_acctbal - s/n) / sqrt(sq/n - (s/n)*(s/n)) AS z_bal,
        |       (c_acctbal - mn) / (mx - mn) AS mm_bal,
        |       (c_acctbal - med) / (q3 - q1) AS rb_bal
        |FROM customer CROSS JOIN st ORDER BY c_custkey""".stripMargin,

    "q_split_train" -> (C + s", $splitSql\n" +
      "SELECT id, t, e, rn FROM churn_rn CROSS JOIN tl WHERE rn < train_len ORDER BY id"),

    "q_split_test" -> (C + s", $splitSql\n" +
      "SELECT id, t, e, rn FROM churn_rn CROSS JOIN tl WHERE rn >= train_len ORDER BY id"),

    // the train bound is part of batch semantics (ds.batch filters the
    // TRAIN split): carrying it in the oracle keeps the twin exact at
    // ANY SF, not just those where the window sits inside the split
    // (at n in ~[285, 355] the unbounded form would diverge)
    "q_batch_window" -> (C + s", $splitSql\n" +
      "SELECT id, rn, t, e FROM churn_rn CROSS JOIN tl " +
      "WHERE rn >= 256 AND rn < 320 AND rn < train_len ORDER BY id"),

    "q_feature_names" -> {
      val values = expectedFeatures.zipWithIndex
        .map { case (f, i) => s"('$f', $i)" }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(feature, pos) ORDER BY pos"
    },

    "q_onehot_mktsegment" -> {
      val cases = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        .map(v => s"""CASE WHEN c_mktsegment = '$v' THEN 1 ELSE 0 END AS "c_mktsegment_$v"""")
        .mkString(",\n       ")
      C + s"SELECT id,\n       $cases\nFROM churn ORDER BY id"
    },

    "q_tensorize" -> {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        .map(v => s"CAST(CASE WHEN c_mktsegment = '$v' THEN 1 ELSE 0 END AS REAL)")
      val nations = (0 until 25).map(i => s"NATION_$i").sorted
        .map(v => s"CAST(CASE WHEN n_name = '$v' THEN 1 ELSE 0 END AS REAL)")
      val entrySeq = Seq("CAST(c_acctbal AS REAL)") ++ segs ++ nations ++
        Seq("CAST(n_orders AS REAL)", "CAST(total_spent AS REAL)")
      val entries = entrySeq.mkString(",\n    ")
      val k = entrySeq.length
      C + s", $splitSql,\n" +
        s"""xs AS (SELECT rn, list_value(
           |    $entries) AS x,
           |  CAST(t AS DOUBLE) AS t, e
           |FROM churn_rn CROSS JOIN tl WHERE rn < train_len)
           |SELECT rn, CAST(r.range AS INT) AS idx,
           |  x[CAST(r.range AS INT) + 1] AS xval, t, e
           |FROM xs CROSS JOIN range($k) r ORDER BY rn, idx""".stripMargin
    },

    "q_label_discretize" -> (C + s", $splitSql," +
      """
        |tr AS (SELECT churn_rn.* FROM churn_rn CROSS JOIN tl WHERE rn < train_len),
        |cut AS (SELECT CAST(min(t) AS DOUBLE) AS tmin, CAST(max(t) AS DOUBLE) AS tmax FROM tr)
        |SELECT id, t,
        |  LEAST(GREATEST(CAST(FLOOR((CAST(t AS DOUBLE) - tmin)
        |    / ((tmax - tmin) / CAST(9 AS DOUBLE))) AS INT), 0), 9) AS t_idx
        |FROM churn_rn CROSS JOIN cut ORDER BY id""".stripMargin),

    "q_label_discretize_pycox" -> (C + s", $splitSql," +
      """
        |tr AS (SELECT churn_rn.* FROM churn_rn CROSS JOIN tl WHERE rn < train_len),
        |cut AS (SELECT CAST(min(t) AS DOUBLE) AS tmin, CAST(max(t) AS DOUBLE) AS tmax FROM tr)
        |SELECT id, t,
        |  LEAST(GREATEST(CAST(FLOOR((CAST(t AS DOUBLE) - tmin)
        |    / ((tmax - tmin) / CAST(9 AS DOUBLE))) AS INT), 0), 9) AS t_idx,
        |  CASE WHEN CAST(t AS DOUBLE) > tmax THEN 0 ELSE e END AS e_adm
        |FROM churn_rn CROSS JOIN cut ORDER BY id""".stripMargin))
}
