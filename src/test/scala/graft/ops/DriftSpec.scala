package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("per-token KL terms match the hand computation; total >= 0") {
    import spark.implicits._
    // A: "x x y"  B: "x z"  -> vocab {x,y,z}, na=3, nb=2, V=3
    val docs = Seq(("A", "x x y"), ("B", "x z")).toDF("slice", "text")
    val got = Drift.klByToken(docs, "slice", "A", "B", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    def term(ca: Long, cb: Long): Double = {
      val p = (ca + 1.0) / (3 + 3.0); val q = (cb + 1.0) / (2 + 3.0)
      p * math.log(p / q)
    }
    def check(tok: String, ca: Long, cb: Long): Unit = {
      val (gca, gcb, gkl) = got(tok)
      assert((gca, gcb) == ((ca, cb)), tok)
      assert(math.abs(gkl - term(ca, cb)) < 1e-6, tok)
    }
    check("x", 2, 1); check("y", 1, 0); check("z", 0, 1)
    // Gibbs: KL of the smoothed distributions is non-negative. The
    // smoothed p's sum to (na+V)/(na+V)=1 over the union vocab, so the
    // term sum IS the divergence (up to the 6dp per-term rounding).
    assert(got.values.map(_._3).sum >= -3e-6)
  }

  test("slices outside (a, b) are ignored; empty tokens dropped") {
    import spark.implicits._
    val docs = Seq(("A", "x"), ("B", "x"), ("C", "zzz zzz"), ("A", ""))
      .toDF("slice", "text")
    val toks = Drift.klByToken(docs, "slice", "A", "B", "text").collect()
      .map(_.getString(0)).toSet
    assert(toks == Set("x"))
  }
}
