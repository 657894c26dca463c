package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("z-scores match the hand computation; threshold gates the flag") {
    import spark.implicits._
    // A: mean 20, var 1600, sd 40 -> z(100) = 2
    val df = Seq(("A", 0.0), ("A", 0.0), ("A", 0.0), ("A", 0.0),
      ("A", 100.0)).toDF("g", "v")
    val at3 = Anomaly.zscoreFlags(df, "g", "v").collect()
      .map(r => r.getDouble(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(math.abs(at3(100.0)._1 - 2.0) < 1e-12 && !at3(100.0)._2)
    assert(math.abs(at3(0.0)._1 + 0.5) < 1e-12)
    val at15 = Anomaly.zscoreFlags(df, "g", "v", threshold = 1.5).collect()
      .map(r => r.getDouble(1) -> r.getBoolean(3)).toMap
    assert(at15(100.0) && !at15(0.0))
  }

  test("constant group yields null z, never flags; nulls unflagged") {
    import spark.implicits._
    val df = Seq(("B", Some(5.0)), ("B", Some(5.0)), ("B", None))
      .toDF("g", "v")
    val got = Anomaly.zscoreFlags(df, "g", "v").collect()
    assert(got.forall(r => r.isNullAt(2) && !r.getBoolean(3)))
  }
}
