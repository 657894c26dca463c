package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The use-after-release contract (VERDICT r17 #2): a checkpoint-backed
  * frame that escapes the scope that released it must fail NAMING the
  * contract ("consume the result inside the scope"), not with Spark's
  * generic block-manager "block not found" far from the bug.
  */
class PinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("use-after-release is diagnosed at operator boundaries, not a " +
      "block-manager error") {
    import spark.implicits._
    // an operator-shaped lifecycle: final checkpoint pinned to the
    // scope, result consumed inside, a DERIVED frame escapes
    val stale = Pins.scoped {
      val ckpt = (1 to 100).toDF("x").localCheckpoint(true)
      Pins.pinCheckpoint(ckpt)
      assert(ckpt.count() == 100L) // consumed inside, per the contract
      ckpt.select((col("x") + 1).as("y"))
    }
    // the debug helper names the released checkpoint...
    val e = intercept[IllegalStateException] {
      Pins.requireConsumable(stale)
    }
    assert(e.getMessage.contains("already released"))
    assert(e.getMessage.contains("Consume an operator's result inside"))
    // ...and both operator entry points fail loudly with the same
    // diagnostic instead of executing into a dead block
    val e2 = intercept[IllegalStateException] {
      org.apache.spark.sql.graft.bridge.rebind(spark, stale)
    }
    assert(e2.getMessage.contains("already released"))
    val e3 = intercept[IllegalStateException] { Pins.pin(stale) }
    assert(e3.getMessage.contains("already released"))
  }

  test("tombstone walk follows a re-bound frame's derived lineage") {
    import spark.implicits._
    // the real iterative-operator return shape: the final checkpoint is
    // re-bound into the caller's session, so the escaping frame's
    // LogicalRDD holds a DERIVED rdd (toRdd over the checkpoint), not
    // the checkpoint rdd itself — the diagnostic must walk lineage
    val clone = org.apache.spark.sql.graft.bridge.sessionClone(spark)
    val stale = Pins.scoped {
      val ckpt = (1 to 50).toDF("x").localCheckpoint(true)
      Pins.pinCheckpoint(ckpt)
      val rebound = org.apache.spark.sql.graft.bridge.rebind(
        spark, ckpt.select((col("x") * 2).as("y")))
      assert(rebound.count() == 50L)
      rebound
    }
    val hit = Pins.releasedCheckpointIn(stale)
    assert(hit.isDefined,
      "released checkpoint not found through the re-bound frame's lineage")
    intercept[IllegalStateException] {
      org.apache.spark.sql.graft.bridge.rebind(clone, stale)
    }
  }

  test("live checkpoints and rotation-internal frames pass the check") {
    import spark.implicits._
    val live = (1 to 10).toDF("x").localCheckpoint(true)
    Pins.requireConsumable(live) // no throw: not released
    Pins.pin(live.select(col("x"))).unpersist()
    Pins.releaseCheckpoint(live) // rotation-style release tombstones it
    assert(Pins.releasedCheckpointIn(live).contains(
      live.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.head))
  }
}
