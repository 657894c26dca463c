package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("no false negatives: every corpus key probes as might-contain") {
    val corpus = (0L until 5000L).map(i => s"key-$i").toDF("k")
    val bf = BloomGate.buildFilter(corpus, "k",
      expectedItems = 5000L, numBits = 40000L)
    val missed = corpus
      .filter(!BloomGate.mightContain(col("k"), bf)).count()
    assert(missed == 0L, s"$missed corpus keys probed as unseen")
  }

  test("false positives stay near the configured rate") {
    val corpus = (0L until 5000L).map(i => s"key-$i").toDF("k")
    // 8 bits/item ≈ 2% fpp with Spark's default hash count
    val bf = BloomGate.buildFilter(corpus, "k",
      expectedItems = 5000L, numBits = 40000L)
    val fresh = (0L until 10000L).map(i => s"other-$i").toDF("k")
    val fp = fresh.filter(BloomGate.mightContain(col("k"), bf)).count()
    assert(fp < 10000L * 0.06, s"fpp blew past 3x the design rate: $fp")
    assert(fp > 0L, "a 0-fp run at 8 bits/item means the probe " +
      "isn't reading the same filter the build wrote")
  }

  test("decontaminate returns exactly the truly-new rows") {
    val corpus = (0L until 3000L).map(i => (i, s"doc-$i")).toDF("id", "k")
      .select(col("k"))
    // batch: 500 seen keys + 500 fresh ones
    val batch = ((2500L until 3000L) ++ (9000L until 9500L))
      .map(i => (i, s"doc-$i")).toDF("doc_id", "k")
    val out = BloomGate.decontaminate(batch, corpus, "k",
      expectedItems = 3000L, numBits = 24000L)
    val got = out.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == (9000L until 9500L).toSet)
    // and the corpus side of the plan is scan + broadcast probes —
    // never a corpus shuffle (no shuffle exchange under the semi join)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast probe in:\n$p")
  }

  test("null keys pass the gate unseen instead of crashing the probe") {
    val corpus = Seq("a", "b").toDF("k")
    val batch = Seq((1L, "a"), (2L, null.asInstanceOf[String]),
      (3L, "z")).toDF("doc_id", "k")
    val out = BloomGate.decontaminate(batch, corpus, "k",
        expectedItems = 100L, numBits = 800L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L))
  }
}
