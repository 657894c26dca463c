package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The r19 optimization that swapped the PageRank/QualityFilter exact
  * sums from `CAST(SUM(CAST(x AS DECIMAL(38,15))) AS DOUBLE)` to the
  * two-long [[Dec15]] aggregate changes operator internals, so the
  * contract is pinned here: BIT-IDENTICAL results on the documented
  * domain, under grouping, multi-partition merges (carry path), nulls
  * and cast-overflow skips, in both the pre-split and convenience
  * forms.
  */
class Dec15Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def decSum = (c: org.apache.spark.sql.Column) =>
    sum(c.cast(DecimalType(38, 15))).cast("double")

  private def bothForms(df: org.apache.spark.sql.DataFrame): Long =
    df.select(col("k"), col("x"),
        Dec15.dec15_split(col("x")).as("_s"))
      .groupBy("k")
      .agg(decSum(col("x")).as("a"),
        Dec15.dec15_sum_split(col("_s")).as("b"),
        Dec15.dec15_sum(col("x")).as("c"))
      .filter(not(col("a") <=> col("b")) || not(col("a") <=> col("c")))
      .count()

  test("fuzz: grouped sums equal the decimal idiom bit-for-bit") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.tabulate(4000) { i =>
      val x = rnd.nextInt(6) match {
        case 0 => rnd.nextDouble()                       // (0,1)
        case 1 => -rnd.nextDouble() * 1e-8               // tiny negative
        case 2 => rnd.nextDouble() * 1e10                // slow path
        case 3 => -rnd.nextDouble() * 8e17               // slow split path, in-domain sums
        case 4 => rnd.nextGaussian()                     // mixed signs
        case _ => 1.0 / (rnd.nextInt(1000) + 1)          // the m/od shape
      }
      (i % 37, x)
    }
    // 7 partitions: partial maps + merges (the carry path) exercised
    assert(bothForms(rows.toDF("k", "x").repartition(7)) === 0L)
  }

  test("nulls are skipped; empty/all-null groups yield NULL; a " +
      "cast-overflowing input is SKIPPED (ANSI decimal would throw — " +
      "deliberate: outside the documented domain dec15 degrades to " +
      "skip-null, never a silently wrong sum)") {
    val rows: Seq[(Int, Option[Double])] = Seq(
      (0, Some(1.5)), (0, None), (0, Some(-2.25)),
      (1, None), (1, None),
      (2, Some(1e25)), (2, Some(3.0)), // 1e25 overflows Decimal(38,15)
      (3, Some(0.0)))
    val df = rows.toDF("k", "x")
    assert(bothForms(df.filter(col("k") =!= 2)) === 0L)
    val out = df.select(col("k"), Dec15.dec15_split(col("x")).as("_s"))
      .groupBy("k").agg(Dec15.dec15_sum_split(col("_s")).as("b"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(out(0) === Some(-0.75))
    assert(out(1) === None)
    assert(out(2) === Some(3.0)) // the overflowing row skipped
    assert(out(3) === Some(0.0))
  }

  test("carry correctness: many lo-limb values that force renormalization") {
    // 0.9e3-ish values: unscaled ≈ 9e17, two of them cross 1e18 — every
    // few updates carries into hi
    val rows = Seq.tabulate(500)(i => (i % 3, 900.0 - i * 1e-7))
    assert(bothForms(rows.toDF("k", "x").repartition(5)) === 0L)
  }

  test("non-finite inputs are skipped like the non-ANSI cast's NULL " +
      "(r19 advisory: Decimal(NaN) would throw NumberFormatException)") {
    val rows = Seq((0, Double.NaN), (0, 2.5), (0, Double.PositiveInfinity),
      (1, Double.NegativeInfinity), (2, 1.25))
    val out = rows.toDF("k", "x")
      .select(col("k"), Dec15.dec15_split(col("x")).as("_s"))
      .groupBy("k").agg(Dec15.dec15_sum_split(col("_s")).as("b"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(out(0) === Some(2.5)) // NaN and +Inf skipped
    assert(out(1) === None)      // only a non-finite input: NULL group
    assert(out(2) === Some(1.25))
  }

  test("an out-of-domain ACCUMULATED sum fails loud even under " +
      "spark.sql.ansi.enabled=false (r19 verdict: the hi-limb adds are " +
      "pinned to ANSI evalMode, so the overflow can never wrap into a " +
      "silently wrong finite double)") {
    // each input is inside the per-row split domain (hi = 9e18 fits a
    // long) but two of them cross the signed-long hi range
    val rows = Seq((0, 9.0e21), (0, 9.0e21))
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ex = intercept[Throwable] {
        rows.toDF("k", "x")
          .select(col("k"), Dec15.dec15_split(col("x")).as("_s"))
          .groupBy("k").agg(Dec15.dec15_sum_split(col("_s")).as("b"))
          .collect()
      }
      val causes = Iterator.iterate(ex)(_.getCause)
        .takeWhile(_ != null).take(10).toSeq
      assert(causes.exists(c => c.isInstanceOf[ArithmeticException] ||
        Option(c.getMessage).exists(m =>
          m.toLowerCase.contains("overflow"))),
        s"expected a loud arithmetic overflow, got: $ex")
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }
}
