package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlViewsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("spark.sql over registered views + custom SQL functions") {
    SqlViews.register(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT count(*) FROM lineitem").head().getLong(0)
    assert(n > 1000)
    val churn = spark.sql(
      "SELECT count(*) FROM churn WHERE e = 1").head().getLong(0)
    assert(churn > 0)
    val rh = spark.sql(
      "SELECT rolling_hash('ab')").head().getLong(0)
    assert(rh == 97L * 31 + 98)
    val dot = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)), " +
        "array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)))").head().getDouble(0)
    assert(dot == 9.0)
    val ev = spark.sql(
      "SELECT count(*) FROM events WHERE event_type IS NOT NULL").head().getLong(0)
    assert(ev > 0)
    // product() as plain aggregate and as a running window aggregate
    val p = spark.sql(
      "SELECT product(x) FROM VALUES (2.0), (3.0), (4.0) AS t(x)")
      .head().getDouble(0)
    assert(p == 24.0)
    val running = spark.sql(
      "SELECT product(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND CURRENT ROW) FROM VALUES (2.0), (3.0), (4.0) AS t(x)")
      .collect().map(_.getDouble(0)).toSeq
    assert(running == Seq(2.0, 6.0, 24.0))
    // DuckDB parity: NULL for all-null input and for empty groups;
    // null rows are skipped like built-in aggregates
    assert(spark.sql(
      "SELECT product(x) FROM VALUES (CAST(NULL AS DOUBLE)) AS t(x)")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT product(x) FROM VALUES (CAST(NULL AS DOUBLE)), (2.0), (3.0) " +
        "AS t(x)").head().getDouble(0) == 6.0)
    assert(spark.sql(
      "SELECT product(x) FROM VALUES (1.0) AS t(x) WHERE x > 5")
      .head().isNullAt(0))
    // unicode canonicalization (DuckDB-parity nfc_normalize name);
    // input e + COMBINING ACUTE (U+0301) must normalize to the
    // precomposed U+00E9
    val nfcIn = "e" + "\u0301"
    val nfcWant = "\u00e9"
    assert(spark.sql(s"SELECT nfc_normalize('$nfcIn')")
      .head().getString(0) == nfcWant)
    assert(spark.sql("SELECT nfkc_normalize('\ufb01sh')")
      .head().getString(0) == "fish")
    // bounded-heap grouped top-k through SQL
    val tk = spark.sql(
      "SELECT e.id FROM (SELECT explode(top_k(CAST(x AS DOUBLE), " +
        "CAST(id AS BIGINT), 2)) AS e " +
        "FROM VALUES (1, 10.0), (2, 30.0), (3, 20.0) AS t(id, x))")
      .collect().map(_.getLong(0)).toSeq
    assert(tk == Seq(2L, 3L))
    assert(intercept[Exception](
      spark.sql("SELECT top_k(1.0, 2) FROM customer").collect())
      .getMessage.contains("exactly 3 arguments"))
  }

  test("heavy_hitters rejects bad arguments with a readable analysis error") {
    SqlViews.register(spark, "/root/testdata/sf0.001")
    def msgOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(msgOf("SELECT heavy_hitters(c_mktsegment) FROM customer")
      .contains("exactly 2 arguments"))
    assert(msgOf(
      "SELECT heavy_hitters(c_mktsegment, c_nationkey) FROM customer")
      .contains("literal integer"))
  }

  test("GraftExtensions registers the functions through the builder") {
    import org.apache.spark.sql.SparkSession
    val old = spark
    // build a FRESH session so the extensions path — not
    // registerFunctions — provides the functions. (The equivalent
    // `--conf spark.sql.extensions=graft.GraftExtensions` is a STATIC
    // conf, applied only at SparkContext creation, so a shared-context
    // test suite must go through Builder.withExtensions instead —
    // same class, same injection point.)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne old)
      val rh = s2.sql("SELECT rolling_hash('ab')").head().getLong(0)
      assert(rh == 97L * 31 + 98)
      val p = s2.sql("SELECT product(x) FROM VALUES (2.0), (5.0) AS t(x)")
        .head().getDouble(0)
      assert(p == 10.0)
      val hh = s2.sql(
          "SELECT heavy_hitters(x, 4) FROM VALUES ('a'), ('b'), ('a') AS t(x)")
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
