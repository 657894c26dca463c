package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("int8 codes: endpoints exact, constant dim zero, error bounded") {
    import spark.implicits._
    // dim 0 spans [0, 10]; dim 1 is constant 7
    val df = Seq((1L, Seq(0.0f, 7.0f)), (2L, Seq(10.0f, 7.0f)),
      (3L, Seq(5.0f, 7.0f))).toDF("id", "v")
    val got = Quantize.int8(df, "id", "v").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    assert(got((1L, 0)) == ((0, 0.0)))      // min -> code 0, exact
    assert(got((2L, 0)) == ((255, 0.0)))    // max -> code 255, exact
    val (midCode, midErr) = got((3L, 0))    // 5.0 -> 127 or 128
    assert(midCode == 127 || midCode == 128)
    assert(midErr <= 10.0 / 255 / 2 + 1e-6) // half a step (+6dp rounding)
    // constant dimension: code 0, reconstructs the constant exactly
    Seq(1L, 2L, 3L).foreach(id => assert(got((id, 1)) == ((0, 0.0))))
  }

  test("silhouette: tight own cluster scores near 1, midpoint near 0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)),   // cluster at origin
      (3L, Seq(10.0f, 0.0f)), (4L, Seq(10.1f, 0.0f)), // cluster at 10
      (5L, Seq(5.05f, 0.0f)))                          // near the midpoint
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(0.05, 0.0)), (1, Seq(10.05, 0.0)))
      .toDF("cell", "centroid")
    val got = Similarity.silhouette(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 == 0 && got(1L)._2 > 0.9)
    assert(got(4L)._1 == 1 && got(4L)._2 > 0.9)
    assert(math.abs(got(5L)._2) < 0.01) // equidistant -> s ~ 0
  }
}
