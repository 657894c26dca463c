package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth property tests for the estimators whose gate oracles
  * MIRROR the engine's formula (KMV/HLL/CMS/quantile sketches, KL
  * drift, mutual information, silhouette, IPCW Brier). The driver's
  * DuckDB parity gate is structurally blind to a wrong formula both
  * sides share — round 9's KMV under-full-denominator bug stayed
  * 160/160 green because engine AND oracle divided by the same wrong
  * k. Every assertion here is against ground truth computed a
  * DIFFERENT way (plain Scala set/math operations, textbook error
  * bounds, or definitional invariants like Gibbs' inequality), on
  * adversarial inputs: under-full sketches, identical sets, disjoint
  * sets, heavy skew, all-identical values, uncensored data.
  */
class StatisticalOracleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ------------------------------------------------------------- KMV

  test("KMV cardinality: exact when under-full; inside sampling error " +
    "when full, across seeds") {
    import spark.implicits._
    // under-full (n < k): the sketch IS the set — estimate must be exact
    val small = (1 to 50).map(i => ("s", s"k$i")).toDF("scope", "key")
    assert(Sketches.kmvEstimate(
      Sketches.kmvSketch(small, "scope", "key", 7L)).head().getDouble(1)
      == 50.0)
    // full: k=256 → relative σ ≈ 1/√(k−2) ≈ 6.3%; every seed inside
    // 4σ, the seed-mean inside ~1.6σ
    val n = 20000
    val big = (1 to n).map(i => ("s", s"key$i")).toDF("scope", "key")
    val ests = (1L to 5L).map(seed => Sketches.kmvEstimate(
      Sketches.kmvSketch(big, "scope", "key", seed)).head().getDouble(1))
    ests.foreach(e =>
      assert(math.abs(e - n) < 0.25 * n, s"seed estimate $e vs $n"))
    val mean = ests.sum / ests.size
    assert(math.abs(mean - n) < 0.10 * n, s"seed-mean $mean vs $n")
  }

  test("KMV Jaccard: tracks exact set Jaccard; identical small sets " +
    "report exactly 1 (the r9 under-full-denominator bug class)") {
    import spark.implicits._
    // the q_sketch_kmv estimator, over synthetic scopes — asserted
    // against EXACT Jaccard from Scala set algebra, not the oracle SQL
    def jEst(a: Seq[String], b: Seq[String]): Double = {
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("scope", "key")
      val sk = Sketches.kmvSketch(df, "scope", "key", 13L)
      val union = Sketches.kmvMerge(sk, "u")
      val hs = df.select(col("scope"),
        Sampling.hash60(col("key"), 13L).as("h")).distinct()
      val common = union.select(col("h"))
        .join(hs.filter(col("scope") === "a").select(col("h")),
          Seq("h"), "left_semi")
        .join(hs.filter(col("scope") === "b").select(col("h")),
          Seq("h"), "left_semi")
        .count().toDouble
      common / math.min(Sketches.KmvK.toDouble, union.count().toDouble)
    }
    val a = (0 until 1200).map(i => s"t$i")
    val b = (600 until 1800).map(i => s"t$i")
    val exact = 600.0 / 1800.0 // |∩| / |∪| from the constructions
    // σ ≈ √(J(1−J)/k) ≈ 0.029 at k=256 → 4σ ≈ 0.12
    assert(math.abs(jEst(a, b) - exact) < 0.12)
    // identical UNDER-FULL sets: union sketch holds 100 < k hashes;
    // dividing by k (the r9 bug) would report 100/256 = 0.39
    val tiny = (0 until 100).map(i => s"w$i")
    assert(jEst(tiny, tiny) == 1.0)
    // disjoint sets share no hash
    assert(jEst(a, (5000 until 6200).map(i => s"t$i")) == 0.0)
  }

  test("k-min sample quantiles approximate known population quantiles") {
    import spark.implicits._
    // population 0..n-1: the true p-quantile is p·n by construction
    val n = 50000
    val df = (0 until n).map(_.toDouble).toDF("x")
    val samp = Sketches.kminSample(df, col("x"), seed = 17L, k = 2048)
      .collect().map(_.getDouble(0)).sorted
    // sample-quantile σ = n·√(p(1−p)/k) ≤ 0.011·n at k=2048 → ~5σ
    Seq(0.1, 0.5, 0.9).foreach { p =>
      val est = samp(((samp.length - 1) * p).toInt)
      assert(math.abs(est - p * n) < 0.06 * n,
        s"p=$p estimate $est vs ${p * n}")
    }
  }

  // ------------------------------------------------------------- CMS

  test("CMS: NEVER under-counts (defining guarantee), hot key near " +
    "exact under heavy skew, absent key ~0") {
    import spark.implicits._
    val rows = Seq.fill(5000)("hot") ++ (1 to 800).map(i => s"cold$i")
    val df = rows.toDF("key")
    val sk = Sketches.cmsSketch(df, "key")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cands = (truth.keys.toSeq :+ "absent").toDF("key")
    val est = Sketches.cmsLookup(sk, cands, "key").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-sided: est ≥ true for EVERY key, including the 800 singletons
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS under-counted $k: ${est(k)} < $c") }
    // overcount bound: ≤ 3·N/w (N=5800, w=1024 → ≤ 17) — min over
    // d=4 rows makes a hot-key collision on ALL rows ~impossible
    val totalN = rows.size
    est.foreach { case (k, e) =>
      assert(e - truth.getOrElse(k, 0L) <= 3.0 * totalN / Sketches.CmsW,
        s"CMS overcounted $k: $e vs ${truth.getOrElse(k, 0L)}") }
  }

  // ------------------------------------------------------------- HLL

  test("HLL: relative error inside bounds across seeds, in BOTH the " +
    "linear-counting and raw regimes; one distinct value estimates 1") {
    import spark.implicits._
    def estOf(df: org.apache.spark.sql.DataFrame, seed: Long): Double =
      Sketches.hllEstimate(Sketches.hllSketch(df, "scope", "key", seed))
        .head().getDouble(3)
    // m=4096 → σ = 1.04/√m ≈ 1.63%; allow 5.5σ per seed, 2.5σ on mean
    Seq(5000, 50000).foreach { n => // n≈1.2m (LC branch) and n≈12m (raw)
      val df = (1 to n).map(i => ("s", s"v$i")).toDF("scope", "key")
      val errs = (1L to 6L).map(seed => math.abs(estOf(df, seed) - n) / n)
      errs.foreach(e => assert(e < 0.09, s"n=$n seed error $e"))
      assert(errs.sum / errs.size < 0.04, s"n=$n mean error ${errs.sum / 6}")
    }
    // all-identical input: exactly one register fires → est ≈ 1
    val one = Seq.fill(100)(("s", "x")).toDF("scope", "key")
    assert(math.abs(estOf(one, 3L) - 1.0) < 0.01)
  }

  // ------------------------------------------------------------ drift

  test("KL drift: Gibbs inequality (≥0, =0 iff identical slices) and " +
    "agreement with an independent scalar computation") {
    import spark.implicits._
    val docs = (Seq.fill(30)("alpha beta") ++ Seq.fill(10)("gamma"))
      .map(("a", _)) ++
      (Seq.fill(10)("alpha beta") ++ Seq.fill(30)("gamma")).map(("b", _))
    val kl = Drift.klByToken(docs.toDF("slice", "text"),
      "slice", "a", "b", "text").collect().map(_.getDouble(3)).sum
    // scalar ground truth from the raw counts (alpha 30/10, beta 30/10,
    // gamma 10/30; na=70, nb=50, V=3), add-1 smoothing, plain math.log
    val exact = Seq((30.0, 10.0), (30.0, 10.0), (10.0, 30.0)).map {
      case (ca, cb) =>
        val p = (ca + 1) / (70 + 3); val q = (cb + 1) / (50 + 3)
        p * math.log(p / q)
    }.sum
    assert(kl > 0.0)
    assert(math.abs(kl - exact) < 1e-4, s"engine $kl vs scalar $exact")
    // identical slices: p = q for every token → every term EXACTLY 0
    val same = (1 to 20).flatMap(i =>
      Seq(("a", s"tok$i tok${i % 5}"), ("b", s"tok$i tok${i % 5}")))
    val zeroTerms = Drift.klByToken(same.toDF("slice", "text"),
      "slice", "a", "b", "text").collect().map(_.getDouble(3))
    assert(zeroTerms.nonEmpty && zeroTerms.forall(_ == 0.0))
  }

  test("mutual information: exactly 0 for independent balanced columns, " +
    "ln 2 for identical balanced binary columns") {
    import spark.implicits._
    // i%2 ⟂ (i/2)%3 over 0..59 by construction: every joint cell = 10,
    // marginals 30/20 → every term ln(1) = 0
    val indep = (0 until 60).map(i => (s"a${i % 2}", s"b${(i / 2) % 3}"))
      .toDF("x", "y")
    assert(Drift.mutualInfoPairs(indep, "x", "y")
      .collect().map(_.getDouble(3)).sum == 0.0)
    // y = x, balanced binary → MI = H(x) = ln 2 (from information
    // theory, not the engine's term formula)
    val dep = (0 until 40).map(i => (s"c${i % 2}", s"c${i % 2}"))
      .toDF("x", "y")
    val mi = Drift.mutualInfoPairs(dep, "x", "y")
      .collect().map(_.getDouble(3)).sum
    assert(math.abs(mi - math.log(2.0)) < 1e-5, s"MI $mi vs ln2")
  }

  // ------------------------------------------------------- silhouette

  test("silhouette: ≈1 for tight well-separated clusters, exactly 0 " +
    "at the equidistant midpoint") {
    import spark.implicits._
    val pts =
      (0 until 10).map(i => (i.toLong,
        Array(0.0f + i * 0.001f, 0.0f))) ++
      (10 until 20).map(i => (i.toLong,
        Array(10.0f + (i - 10) * 0.001f, 10.0f))) :+
      (99L, Array(5.0f, 5.0f)) // exact midpoint of the two centroids
    val corpus = pts.toDF("id", "v")
    val cents = Seq((0, Array(0.0, 0.0)), (1, Array(10.0, 10.0)))
      .toDF("cell", "carr")
    val sil = Similarity.silhouette(corpus, "id", "v", cents)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val clustered = sil.filter(_._1 != 99L).values
    assert(clustered.forall(_ > 0.99),
      s"tight clusters scored ${clustered.min} min")
    assert(sil(99L) == 0.0, s"midpoint scored ${sil(99L)}")
  }

  // --------------------------------------------------------- PageRank

  test("PageRank analytic invariants: uniform fixed point on a regular " +
    "graph; mass conservation with dangling nodes") {
    import spark.implicits._
    // a directed cycle is 1-regular: the stationary distribution is
    // uniform for EVERY damping factor (analytic fact, no formula
    // shared with the power-iteration implementation)
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val r = PageRank.ranks(cycle, iters = 20)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("m")).toMap
    assert(r.size == 4)
    r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-6, r.toString))
    // dangling node: 'sink' has no out-edges; total mass must still be
    // conserved at n (the teleport + dangling redistribution identity)
    val dangling = Seq(("a", "b"), ("b", "sink"), ("a", "sink"))
      .toDF("src", "dst")
    val masses = PageRank.ranks(dangling, iters = 15)
      .collect().map(_.getAs[Double]("m"))
    assert(masses.length == 3)
    assert(math.abs(masses.sum - 3.0) < 1e-4,
      s"mass not conserved: ${masses.sum}")
  }

  // ------------------------------------------------------------- BM25

  test("BM25 matches an independently-coded Robertson/Okapi computation") {
    import spark.implicits._
    val texts = Seq(
      1L -> "apple banana apple",
      2L -> "apple cherry",
      3L -> "banana banana banana cherry")
    val docs = texts.toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text",
        terms = Seq("apple", "banana"), k1 = 1.2, b = 0.75, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // plain-Scala textbook BM25 (Robertson '94 idf with +1 smoothing,
    // the variant the engine documents) over the same corpus
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    def dfOf(term: String): Double =
      toks.count(_._2.contains(term)).toDouble
    def scoreOf(id: Long): Double = {
      val dl = toks.find(_._1 == id).get._2.size.toDouble
      Seq("apple", "banana").map { term =>
        val tf = toks.find(_._1 == id).get._2.count(_ == term).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log((n - dfOf(term) + 0.5) / (dfOf(term) + 0.5) + 1.0)
          idf * tf * (1.2 + 1.0) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        }
      }.sum
    }
    texts.foreach { case (id, _) =>
      assert(math.abs(got(id) - scoreOf(id)) < 1e-5,
        s"doc $id: engine ${got(id)} vs textbook ${scoreOf(id)}")
    }
    // ranking sanity: the banana-heavy doc wins on the banana term
    assert(got(3L) > got(2L))
  }

  // ---------------------------------------------------- language model

  test("bigram LM: exact hand computation; repeated bigrams score " +
    "higher than hapax bigrams") {
    import spark.implicits._
    // corpus ["x y", "x z"]: c(x)=2, V=3, c(x y)=c(x z)=1 →
    // lm_score of each doc = ln((1+1)/(2+3)) = ln(0.4)
    val tiny = Seq(1L -> "x y", 2L -> "x z").toDF("doc_id", "text")
    val lm = LangModel.bigramScore(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = BigDecimal(math.log(0.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(lm(1L) == want && lm(2L) == want, s"$lm vs $want")
    // fluency ordering: a doc whose bigrams the corpus repeats often
    // must outscore a doc of corpus-unique bigrams
    val corpus = ((1 to 10).map(i => i.toLong -> "the cat sat") :+
      (99L -> "qq rr ss")).toDF("doc_id", "text")
    val sc = LangModel.bigramScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sc(1L) > sc(99L), s"repeated ${sc(1L)} !> hapax ${sc(99L)}")
  }

  // ---------------------------------------------------------- anomaly

  test("z-score anomaly: injected outlier flagged with the exact " +
    "population z; inliers unflagged") {
    import spark.implicits._
    val inliers = (1 to 40).map(i => ("g", 10.0 + (i % 5) - 2.0))
    val rows = inliers :+ (("g", 1000.0))
    val df = rows.toDF("grp", "v")
    val flags = Anomaly.zscoreFlags(df, "grp", "v", threshold = 3.0)
      .collect().map(r => r.getAs[Double]("v") ->
        (r.getAs[Boolean]("is_anomaly"), r.getAs[java.lang.Double]("z")))
      .toMap
    // plain-Scala population moments over the same values
    val vs = rows.map(_._2)
    val mu = vs.sum / vs.size
    val sd = math.sqrt(vs.map(x => (x - mu) * (x - mu)).sum / vs.size)
    val zOut = (1000.0 - mu) / sd
    assert(flags(1000.0)._1, "outlier not flagged")
    assert(math.abs(flags(1000.0)._2 - zOut) < 1e-9,
      s"z ${flags(1000.0)._2} vs scalar $zOut")
    inliers.map(_._2).distinct.foreach(v =>
      assert(!flags(v)._1, s"inlier $v flagged"))
  }

  // ------------------------------------------------------------ Brier

  test("Brier on UNCENSORED data equals the plain mean squared error " +
    "of 1{T>τ} vs S(τ) (IPCW weights must all collapse to 1)") {
    import spark.implicits._
    // all events → censoring KM ≡ 1 → grid() must reduce to the MSE
    val subjects = (1 to 20).map(i => (i.toLong, i.toDouble, 1))
    val base = subjects.toDF("id", "t", "e")
    val grid = Array(5.0, 10.0, 15.0)
    // arbitrary (but deterministic) survival predictions
    def sPred(id: Long, tau: Double): Double =
      math.exp(-tau / (id.toDouble + 3.0))
    val surv = subjects.flatMap { case (id, _, _) =>
      grid.map(tau => (id, tau, sPred(id, tau))) }.toDF("id", "tau", "s")
    val got = graft.eval.BrierScore.grid(base, "id", "t", "e", surv, grid)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    grid.foreach { tau =>
      val mse = subjects.map { case (id, t, _) =>
        val ind = if (t > tau) 1.0 else 0.0
        math.pow(ind - sPred(id, tau), 2)
      }.sum / subjects.size
      assert(math.abs(got(tau) - mse) < 1e-9,
        s"tau=$tau engine ${got(tau)} vs MSE $mse")
    }
  }

  // ----------------------------------------------- two-level semDedup

  test("two-level semDedup equals the FLAT exact argmin + leader rule " +
    "on a separation corpus where the IVF approximation is provably " +
    "exact — and both land on the constructed ground-truth cells") {
    // The q_sim_semdedup_2level oracle is the most intricate SQL in the
    // gate, and it MIRRORS the engine's two-level formula — the
    // structural blindness this suite exists for (the r9 KMV bug
    // class). Ground truth a different way: build a corpus whose
    // cluster geometry makes the two-level rule PROVABLY equal to the
    // flat exact argmin, then require the two-level path to reproduce
    // the flat path (itself replica-validated in OpsSpec) row for row.
    //
    // Geometry: 9 cells, nCoarse = 3, coarse group of cell c = c % 3.
    // base(c) = 10·e_{c%3} + 2·⌊c/3⌋·e_3 — groups live on orthogonal
    // axes (inter-group distance² ≈ 200) and cells within a group are
    // separated by 2 along e_3, while every vector sits within 0.02 of
    // its own cell's base point (and cell id%9 == construction
    // cluster, so the init centroids land ON the clusters). Nearest
    // coarse group is then always the OWN group (margin 200 vs ≤ 4.1)
    // and the nearest fine cell inside it is the global nearest
    // (margin ≥ 3.8 vs ≤ 0.001): two-level ≡ flat, no approximation
    // slack, no tie anywhere near the 6dp boundary.
    import spark.implicits._
    val numCells = 9
    def base(c: Int): Seq[Double] = {
      val axis = c % 3
      Seq(0, 1, 2).map(a => if (a == axis) 10.0 else 0.0) :+
        2.0 * (c / 3).toDouble
    }
    val vecs: Seq[(Long, Seq[Double])] = (0L until 90L).map { i =>
      val b = base((i % 9).toInt)
      val jit = Seq(0.01 * math.cos(i * 0.7), 0.01 * math.sin(i * 1.3),
        0.01 * math.cos(i * 2.1), 0.01 * math.sin(i * 0.4))
      i -> b.zip(jit).map { case (x, j) => x + j }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val tau = 0.999
    val flat = Similarity.semDedup(df, "vec_id", "embedding",
        numCells, tau)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val two = Similarity.semDedupTwoLevel(df, "vec_id", "embedding",
        numCells, tau)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(two == flat,
      "two-level assignment must equal the flat exact argmin on a " +
        "separation corpus — the IVF approximation has zero slack here")
    // constructed ground truth, no engine arithmetic at all: cell is
    // the construction cluster id%9; every cell keeps exactly its
    // lowest id (all within-cell cosines ≈ 1 − 4·10⁻⁶ ≥ tau, every
    // cross-cell cosine far below); dup_of is the cell's leader
    two.foreach { r =>
      val id = r(0).asInstanceOf[Long]
      assert(r(1) == (id % 9).toInt, s"id $id landed in cell ${r(1)}")
      if (id < 9) assert(r(2) == 1 && r(3) == null, s"leader $id: $r")
      else assert(r(2) == 0 && r(3) == id % 9, s"dup $id: $r")
    }
    // non-degenerate: all 3 coarse groups and all 9 cells populated
    assert(two.map(_(1).asInstanceOf[Int]).toSet.size == 9)
  }
}
