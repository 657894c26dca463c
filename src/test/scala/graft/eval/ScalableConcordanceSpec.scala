package graft.eval

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The sort-based C-index must equal the pair-join C-index exactly,
  * including risk ties (0.5 credit) and time ties (excluded), across
  * bucket counts.
  */
class ScalableConcordanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def randomData(n: Int, seed: Long) = {
    import spark.implicits._
    val rng = new Random(seed)
    // coarse grids force plenty of ties in BOTH t and r
    (0 until n).map { _ =>
      (rng.nextInt(15).toDouble, rng.nextInt(2),
        rng.nextInt(8).toDouble / 4.0)
    }.toDF("t", "e", "r")
  }

  test("matches pair-join harrell exactly on tie-heavy data") {
    for ((n, seed, buckets) <- Seq((200, 1L, 4), (350, 2L, 16), (300, 3L, 1))) {
      val df = randomData(n, seed)
      val slow = Concordance.harrell(df, "t", "e", "r").head()
      val fast = ScalableConcordance.harrell(df, "t", "e", "r", buckets).head()
      assert(fast.getLong(0) == slow.getLong(0),
        s"comparable n=$n b=$buckets: ${fast.getLong(0)} != ${slow.getLong(0)}")
      assert(fast.getDouble(1) == slow.getDouble(1),
        s"concordant n=$n b=$buckets: ${fast.getDouble(1)} != ${slow.getDouble(1)}")
    }
  }

  test("matches pair-join antolini exactly on tie-heavy data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for ((n, seed, buckets) <- Seq((150, 4L, 4), (250, 5L, 16))) {
      val rng = new Random(seed)
      val df = (0 until n).map { i =>
        (i.toLong, 1.0 + rng.nextInt(15).toDouble, rng.nextInt(2),
          rng.nextInt(8).toDouble / 4.0)
      }.toDF("id", "t", "e", "r")
      val grid = Array(1.0, 4.0, 8.0, 12.0)
      // coarse survival values → plenty of score ties at each τ
      val g = grid.zipWithIndex.map(p => (p._2, p._1)).toSeq.toDF("tau_idx", "tau")
      val surv = df.crossJoin(g).select(col("id"), col("tau"),
        round(exp(-col("r") * col("tau") / 10.0), 1).as("s"))
      val slow = Concordance.antolini(df, "id", "t", "e", surv, grid).head()
      val fast = ScalableConcordance.antolini(df, "id", "t", "e", surv, grid, buckets).head()
      assert(fast.getLong(0) == slow.getLong(0),
        s"comparable n=$n b=$buckets: ${fast.getLong(0)} != ${slow.getLong(0)}")
      assert(fast.getDouble(1) == slow.getDouble(1),
        s"concordant n=$n b=$buckets: ${fast.getDouble(1)} != ${slow.getDouble(1)}")
    }
  }

  test("matches pair-join harrell on continuous time (range-scan carries)") {
    import spark.implicits._
    // continuous t: |distinct t| = n, so the global-suffix range scan
    // gets multi-row partitions and non-trivial cross-partition
    // carries (the tie-heavy fixture above has only 15 distinct times);
    // continuous r makes every ties-branch run a singleton.
    for ((n, seed) <- Seq((400, 7L), (250, 8L))) {
      val rng = new Random(seed)
      val df = (0 until n).map { _ =>
        (rng.nextDouble() * 100.0, rng.nextInt(2), rng.nextDouble())
      }.toDF("t", "e", "r")
      val slow = Concordance.harrell(df, "t", "e", "r").head()
      val fast = ScalableConcordance.harrell(df, "t", "e", "r", 8).head()
      assert(fast.getLong(0) == slow.getLong(0),
        s"comparable n=$n: ${fast.getLong(0)} != ${slow.getLong(0)}")
      assert(fast.getDouble(1) == slow.getDouble(1),
        s"concordant n=$n: ${fast.getDouble(1)} != ${slow.getDouble(1)}")
    }
  }

  test("local Fenwick sweep counts strict inversions correctly") {
    // hand case: rows (t, e, r)
    val rows = Seq((1.0, 1, 2.0), (2.0, 0, 1.0), (2.0, 1, 3.0), (3.0, 0, 2.5))
    // event (t=1, r=2): j with t>1, r<2 → (2,0,1.0) → 1
    // event (t=2, r=3): j with t>2, r<3 → (3,0,2.5) → 1
    assert(ScalableConcordance.countWithin(rows) == 2L)
  }
}
