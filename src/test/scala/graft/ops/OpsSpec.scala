package graft.ops

import graft.SparkTestBase
import graft.functions.RollingHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("rolling hash: known value, codegen path") {
    import spark.implicits._
    // h("ab") = (0*31+97)*31 + 98 = 3105
    val got = Seq("ab").toDF("t")
      .select(RollingHash.rolling_hash(col("t"))).head().getLong(0)
    assert(got == 97L * 31 + 98)
  }

  test("shingles: 3-gram windows, hashed, distinct, short-doc guard") {
    import spark.implicits._
    // shingles are 60-bit md5-prefix ints at the source (shuffle-width
    // optimization): expected values computed independently here
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh == Set((1L, h60("a b c")), (1L, h60("b c d")))) // doc 2 too short
  }

  test("exact dedup groups duplicates under normalization") {
    import spark.implicits._
    val docs = Seq((1L, "Hello  world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("n") > 1).head()
    assert(g.getLong(1) == 2 && g.getLong(2) == 1 && g.getLong(3) == 2)
  }

  test("minhash LSH finds a true near-duplicate pair") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"zz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.8))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash of near-identical docs is close in hamming distance") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extraword"
    val other = (200 to 260).map(i => s"qq$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val fp = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairs(fp, maxDist = 32).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) < pairs((1L, 3L)))
    assert(pairs((1L, 2L)) <= 4)
  }

  test("brute-force topk: identical vector ranks first with cos 1") {
    import spark.implicits._
    val v1 = Array(1.0f, 0.0f, 0.0f)
    val emb = Seq((0L, v1), (1L, v1), (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", 2).orderBy("rank").collect()
    assert(top(0).getLong(2) == 1L && math.abs(top(0).getDouble(3) - 1.0) < 1e-12)
  }

  test("langid picks the language with most markers") {
    import spark.implicits._
    val df = Seq("le chat et le chien est la", "the cat and the dog is a")
      .toDF("text")
    val got = df.select(TextAnalysis.predictedLang(col("text"))).collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("fr", "en"))
  }

  test("hash sampling is partitioning-independent and splits are exhaustive") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.3, seed = 5L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.hashSample(df.repartition(7), "id", 0.3, seed = 5L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // roughly Bernoulli(0.3) over 2000 keys
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)

    val sp = Sampling.hashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 5L)
    val counts = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L) // exhaustive, disjoint by construction
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // same key -> same split under different partitioning
    val sp2 = Sampling.hashSplit(df.repartition(13), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 5L)
    assert(sp.orderBy("id").collect().map(_.getString(1)).toSeq ==
      sp2.orderBy("id").collect().map(_.getString(1)).toSeq)
  }

  test("as-of backward join: latest preceding match, ties inclusive, no-match nulls") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L))
      .toDF("lid", "k", "t")
    val right = Seq((11L, 10L, 90L), (12L, 10L, 250L), (13L, 10L, 300L),
        (14L, 20L, 60L))
      .toDF("rid", "k", "t")
    val got = AsofJoin.backward(left, right, "k", "t", "t", Seq("rid", "t"))
      .orderBy("lid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSeq
    // lid 1: rid 11 (t=90 <= 100); lid 2: rid 12 (tie t=250 included,
    // 300 excluded); lid 3: no click at t <= 50 -> null
    assert(got == Seq((1L, 11L), (2L, 12L), (3L, -1L)))
  }

  test("salted join equals plain join on a pathologically skewed key") {
    import spark.implicits._
    // 20k rows on ONE hot key + a uniform tail; dim of 50 keys
    val left = ((1 to 20000).map(i => (7L, s"v$i")) ++
      (1 to 1000).map(i => ((i % 50).toLong, s"t$i"))).toDF("k", "payload")
    val right = (0 until 50).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val salted = SkewJoin.salted(left, right, "k", salts = 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted == plain && salted.size == 21000)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wh = java.nio.file.Files.createTempDirectory("bucketed_wh")
    val o = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_mktsegment")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key with equal bucket counts
    // -> Catalyst plans the join with NO shuffle exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(joined.count() == o.count()) // every order matches one customer
    spark.sql("DROP TABLE orders_b"); spark.sql("DROP TABLE customer_b")
  }

  test("chunking: stride windows cover all tokens; short doc = one chunk") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(docs, "doc_id", "text", size = 3, stride = 2)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq
    assert(got == Seq(
      (1L, 0, "a b c", 3), (1L, 1, "c d e", 3), (1L, 2, "e f g", 3),
      (2L, 0, "x y", 2)))
  }
}
