package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // two disjoint vocabularies: target-like docs reuse the "good" words
  private def corpus = {
    import spark.implicits._
    val tgtLike = (1 to 20).map(i => (i.toLong, "alpha beta gamma delta", "t"))
    val offTgt = (21 to 40).map(i => (i.toLong, "omega psi chi phi", "o"))
    (tgtLike ++ offTgt).toDF("doc_id", "text", "kind")
  }

  test("dsir: target-like docs outweigh off-target docs, top-k selected") {
    val docs = corpus
    val out = Dsir.select(docs, docs.filter(col("kind") === "t"),
        "doc_id", "text", numBuckets = 256, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    val (tgt, off) = out.partition(_._1 <= 20)
    // every target-like doc scores strictly above every off-target doc
    assert(tgt.map(_._2).min > off.map(_._2).max)
    // and exactly the target-like docs are selected at k = 20
    assert(tgt.forall(_._3 == 1) && off.forall(_._3 == 0))
  }

  test("dsir: weights are partitioning-independent") {
    val docs = corpus
    def run(parts: Int) =
      Dsir.importanceWeights(docs.repartition(parts),
          docs.filter(col("kind") === "t"), "doc_id", "text", 256)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }
}
