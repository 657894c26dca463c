package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def h60(s: String, seed: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hll: registers match a reference computation and merge by max") {
    import spark.implicits._
    val keys = (1 to 500).map(i => ("a", s"k$i")) ++
      (200 to 700).map(i => ("b", s"k$i"))
    val df = keys.toDF("scope", "key")
    val regs = Sketches.hllSketch(df, "scope", "key", seed = 11L)

    // independent register computation on the driver
    def reg(keys: Seq[String]): Map[Long, Int] =
      keys.map(h60(_, 11L)).groupBy(_ % Sketches.HllM).map { case (b, hs) =>
        b -> hs.map { h =>
          val w = h / Sketches.HllM
          if (w == 0) 49 else 49 - java.lang.Long.toBinaryString(w).length
        }.max
      }
    val expA = reg((1 to 500).map(i => s"k$i"))
    val gotA = regs.filter(col("scope") === "a").collect()
      .map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(gotA == expA)

    // merged registers are the bucketwise max of the scope registers
    val merged = Sketches.hllMerge(regs, "m").collect()
      .map(r => r.getLong(1) -> r.getInt(2)).toMap
    val expB = reg((200 to 700).map(i => s"k$i"))
    val expM = (expA.keySet ++ expB.keySet).map { b =>
      b -> math.max(expA.getOrElse(b, 0), expB.getOrElse(b, 0))
    }.toMap
    assert(merged == expM)
  }

  test("hll: estimate within 5% of exact at n=5000 (m=4096)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("s", s"key$i")).toDF("scope", "key")
    val est = Sketches.hllEstimate(
        Sketches.hllSketch(df, "scope", "key", seed = 11L))
      .head().getAs[Double]("est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.05, s"est=$est")
  }

  test("hll_est aggregate equals the dataflow estimate, incl. duplicates") {
    import spark.implicits._
    // duplicates must not move the estimate (HLL is a distinct sketch)
    val rows = (1 to 3000).map(i => ("s", s"key$i")) ++
      (1 to 1000).map(i => ("s", s"key$i"))
    val df = rows.toDF("scope", "key")
    val viaAgg = df.groupBy(col("scope"))
      .agg(graft.functions.HllAgg.hll_est(col("key"), 11L).as("est"))
      .head().getDouble(1)
    val viaFlow = Sketches.hllEstimate(
        Sketches.hllSketch(df.distinct(), "scope", "key", seed = 11L))
      .head().getAs[Double]("est")
    assert(viaAgg == viaFlow, s"agg=$viaAgg flow=$viaFlow")

    // SQL registration path
    graft.SqlViews.registerFunctions(spark)
    df.createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT hll_est(key, 11) FROM hll_in").head().getDouble(0)
    assert(viaSql == viaFlow)
  }

  test("cms: estimate is an upper bound and exact for heavy keys") {
    import spark.implicits._
    // 1000 occurrences of "hot", 1 each of 200 cold keys
    val rows = Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"c$i")
    val df = rows.toDF("key")
    val sketch = Sketches.cmsSketch(df, "key")
    val cand = Seq(("hot", 1000L), ("c1", 1L)).toDF("key", "exact_cnt")
    val got = Sketches.cmsLookup(sketch, cand, "key").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // CMS never under-counts; with 200 cold keys in 4×1024 cells the
    // hot estimate collides with at most a handful of singletons
    assert(got("hot")._2 >= 1000L && got("hot")._2 <= 1010L)
    assert(got("c1")._2 >= 1L)
  }

  test("kmin sample: partitioning-independent and merges like KMV") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"k$i", i.toDouble)).toDF("k", "v")
    def sample(parts: Int) =
      Sketches.kminSample(df.repartition(parts), col("k"), 17L, 100)
        .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(sample(1) == sample(13))

    // merge property: k-min of (k-min(A) ∪ k-min(B)) == k-min(A ∪ B)
    val a = df.filter(col("v") <= 1000)
    val b = df.filter(col("v") > 1000)
    val sa = Sketches.kminSample(a, col("k"), 17L, 100)
    val sb = Sketches.kminSample(b, col("k"), 17L, 100)
    val merged = Sketches.kminSample(sa.unionByName(sb), col("k"), 17L, 100)
      .collect().map(_.getString(0)).toSet
    val direct = Sketches.kminSample(df, col("k"), 17L, 100)
      .collect().map(_.getString(0)).toSet
    assert(merged == direct)
  }

  test("kmv: sub-k scope is exact, full scope within 15%, merge = union top-k") {
    import spark.implicits._
    val small = (1 to 100).map(i => ("s", s"x$i"))
    val big = (1 to 4000).map(i => ("b", s"y$i"))
    val df = (small ++ big).toDF("scope", "key")
    val sk = Sketches.kmvSketch(df, "scope", "key", seed = 13L)
    assert(sk.filter(col("scope") === "s").count() == 100)
    assert(sk.filter(col("scope") === "b").count() == Sketches.KmvK)

    val est = Sketches.kmvEstimate(sk).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("s") == 100.0) // sub-k: exact count, not an estimate
    assert(math.abs(est("b") - 4000.0) / 4000.0 < 0.15, s"est=${est("b")}")

    // merged sketch = k smallest distinct hashes across both scopes
    val mergedHs = Sketches.kmvMerge(sk, "u").collect().map(_.getLong(1)).toSet
    val expU = (small ++ big).map(p => h60(p._2, 13L)).distinct
      .sorted.take(Sketches.KmvK).toSet
    assert(mergedHs == expU)
  }
}
