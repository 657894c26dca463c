package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r19 optimization that swapped the conv/substring/md5 SQL chain
  * for the direct digest kernel changes an operator-internal
  * expression, so the contract is pinned here: [[Md5Prefix60]] must be
  * BIT-IDENTICAL to `conv(substring(md5(x),1,15),16,10)` (the form
  * every DuckDB oracle still replays) on any input — including the
  * 28-bit Winnow variant derived from it by `>>> 32`.
  */
class Md5Prefix60Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val inputs = Seq(
    "", " ", "a", "the quick brown fox", "of the and",
    "42:12345", "0:0", "ümlaut schön", "的 是 在", "🙂 emoji",
    "a b c d e f g h i j k l m n o p", "x" * 500,
    (0 until 64).map(_.toString).mkString(" "))

  test("equals the conv(substring(md5,1,15),16,10) chain bit-for-bit") {
    val df = inputs.toDF("s")
    val rows = df.select(
      Md5Prefix60.md5_prefix60(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("sql"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // non-negative 60-bit range (the oracle parses it as unsigned hex)
    rows.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60)))
  }

  test("random-string fuzz keeps the equality (codegen and eval paths)") {
    val rnd = new scala.util.Random(7)
    val strs = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString +
      (if (rnd.nextBoolean()) " ü的" else ""))
    val df = strs.toDF("s")
    // codegen'd projection path
    assert(df.select((Md5Prefix60.md5_prefix60(col("s")) =!=
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")).as("ne"))
      .filter(col("ne")).count() === 0L)
    // interpreted path (inside a higher-order function lambda)
    val arr = df.select(array(col("s")).as("a"))
      .select(transform(col("a"), s => Md5Prefix60.md5_prefix60(s)).as("f"),
        transform(col("a"), s =>
          conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("g"))
      .collect()
    arr.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("null propagates; the 28-bit Winnow form matches its SQL chain") {
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.select(Md5Prefix60.md5_prefix60(col("s")).as("h")).collect()
    assert(out.count(_.isNullAt(0)) === 1)
    val g = inputs.toDF("s").select(
      shiftright(Md5Prefix60.md5_prefix60(col("s")), 32).as("fast"),
      conv(substring(md5(col("s")), 1, 7), 16, 10).cast("long").as("sql"))
      .collect()
    g.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }
}
