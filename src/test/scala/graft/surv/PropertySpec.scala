package graft.surv

import graft.SparkTestBase
import graft.eval.KaplanMeier
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for encoder / bucketizer / KM invariants
  * (SURVEY §5 tier 3).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def check(p: Prop): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("linspace: endpoints exact, monotone, length k") {
    check(Prop.forAll(Gen.choose(-1e6, 1e6), Gen.choose(1.0, 1e6),
      Gen.choose(2, 50)) { (lo, span, k) =>
      val cuts = DurationCuts.linspace(lo, lo + span, k)
      cuts.length == k && cuts.head == lo && cuts.last == lo + span &&
        cuts.sliding(2).forall { case Array(a, b) => b > a; case _ => true }
    })
  }

  test("duration cut index: clamped to [0, k-1], grid values map to own bin") {
    check(Prop.forAll(Gen.choose(0.0, 100.0), Gen.choose(1.0, 500.0),
      Gen.choose(2, 12)) { (lo, span, k) =>
      val cuts = DurationCuts(DurationCuts.linspace(lo, lo + span, k))
      import spark.implicits._
      val ts = Seq(lo - 10, lo, lo + span / 2, lo + span, lo + span + 10) ++
        cuts.cuts.toSeq
      val idx = ts.toDF("t").select(cuts.indexCol(col("t"))).collect()
        .map(_.getInt(0))
      idx.forall(i => i >= 0 && i < k)
    })
  }

  test("one-hot: exactly one hot for known values, all zero for unknown") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
      .map(_.distinct)) { cats =>
      val spec = OneHotSpec("c", cats.sorted)
      import spark.implicits._
      val rows = (cats :+ "___unknown___").toDF("c")
      val out = rows.select(col("c") +: spec.exprs: _*).collect()
      out.forall { r =>
        val hots = (1 until r.length).map(r.getInt).sum
        if (r.getString(0) == "___unknown___") hots == 0 else hots == 1
      }
    })
  }

  test("KM: survival in [0,1], non-increasing, risk set telescopes") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 40), Gen.oneOf(0, 1)))) { data =>
      import spark.implicits._
      val df = data.toDF("t", "e")
      val km = KaplanMeier.curve(df, "t", "e").orderBy("t").collect()
      val s = km.map(_.getDouble(3))
      val n = km.map(_.getLong(2))
      s.forall(v => v >= 0.0 && v <= 1.0) &&
        s.sliding(2).forall { case Array(a, b) => b <= a + 1e-15; case _ => true } &&
        n.head == data.size // first risk set = everyone
    })
  }
}
