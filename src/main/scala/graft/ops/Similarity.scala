package graft.ops

import graft.functions.VecDot.vec_dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the
  * (small) query set against the corpus, ranked per query. At 100 TB
  * the corpus side stays partitioned; only queries broadcast, so the
  * scan is embarrassingly parallel and the per-query top-k is a
  * window over each query's partition slice.
  *
  * Scale path: sign-random-projection LSH — 'numPlanes' deterministic
  * integer hyperplanes hash every vector into a bucket; candidate
  * generation is an equi-join on the bucket id (shuffle keyed on
  * content, never all-pairs). An IVF variant would swap the plane
  * hash for a learned coarse quantizer; the bucketing dataflow is
  * identical.
  */
object Similarity {

  /** Deterministic integer hyperplane component: plane b, dim j
    * (same values the DuckDB oracle computes inline).
    */
  def planeComponent(b: Int, j: Int): Double =
    ((b * 37 + j * 101) % 19 - 9).toDouble

  /** Bucket id from sign bits of `numPlanes` integer hyperplanes.
    * Planes are literal double arrays → each dot is one codegen'd
    * VecDot pass over the vector. `planeOffset` selects an
    * independent plane family (band b of a banded scheme uses offset
    * b·numPlanes).
    */
  def lshBucket(vec: Column, dims: Int, numPlanes: Int,
                planeOffset: Int = 0): Column = {
    val dots = (0 until numPlanes).map { b =>
      val plane = array((0 until dims).map(j =>
        lit(planeComponent(planeOffset + b, j))): _*)
      vec_dot(vec, plane)
    }
    dots.zipWithIndex.map { case (d, b) =>
      when(d > 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Brute-force cosine top-k: (qid, rank, vec_id, cos) for each
    * query row, deterministic (cos desc, vec_id) ranking.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("qn")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
        sqrt(vec_dot(col(vecCol), col(vecCol))).as("cn"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer —
    * centroids are per-dimension means of hash-partitioned groups
    * (rounded to 6dp so both engines see identical coordinates; a
    * learned k-means quantizer slots into the same dataflow), every
    * vector is assigned to its nearest centroid cell (squared-L2 via
    * the VecDot identity ‖x−c‖² = x·x − 2x·c + c·c, ties to the
    * lowest cell), and search ranks only within the query's cell.
    * Returns (qid, cell, rank, vec_id, cos).
    *
    * Scale shape: the centroid table is tiny (cells × dims) and
    * broadcast; assignment is a scan-fused projection; the search
    * join is an equi-join on the cell id.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, numCells: Int, k: Int): DataFrame = {
    val cents = initCentroidMap(corpus, idCol, vecCol, numCells)
    def assigned(df: DataFrame, id: String): DataFrame =
      ivfAssign(df, id, vecCol, cents)

    val c = assigned(corpus, idCol)
      .select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
        sqrt(vec_dot(col(vecCol), col(vecCol))).as("cn"), col("cell"))
    val q = broadcast(assigned(queries, idCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        sqrt(vec_dot(col(vecCol), col(vecCol))).as("qn"), col("cell")))
    val scored = c.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cell"), col("vec_id"),
        (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("cell"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Deterministic init: per-dim means of id%cells groups, rounded to
    * 6dp. Driver carry is bounded at cells×dims doubles. The mean
    * runs through an exact DECIMAL sum like every other mean on an
    * oracle-checked path — a plain double avg() is summation-order-
    * dependent, so Spark's partial-agg order vs DuckDB's scan order
    * could round differently at the 6dp boundary and cascade through
    * every downstream assignment.
    */
  private def initCentroidMap(corpus: DataFrame, idCol: String,
                              vecCol: String,
                              numCells: Int): Map[Int, Array[Double]] =
    corpus
      .select((col(idCol) % numCells).cast("int").as("cell"),
        posexplode(col(vecCol)).as(Seq("j", "xv")))
      .groupBy(col("cell"), col("j"))
      .agg(round(
        sum(col("xv").cast(org.apache.spark.sql.types.DecimalType(38, 15)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray)
      .toMap

  private def centDfOf(spark: org.apache.spark.sql.SparkSession,
                       cents: Map[Int, Array[Double]]): DataFrame = {
    import spark.implicits._
    // no broadcast hint: the quantizer table is consumed by collecting
    // back to a driver map (assignCells), never by a join
    cents.toSeq.sortBy(_._1)
      .map { case (b, c) => (b, c.toSeq) }.toDF("cell", "carr")
  }

  /** Lloyd-refined ("learned") coarse quantizer: `iters` rounds of
    * assign → per-cell mean, from the deterministic id%cells init.
    * Each round is ONE assignment pass against the broadcast centroid
    * table + ONE map-side-combined (cell, dim) aggregate; the driver
    * carries cells×dims doubles per round. Update means run through
    * exact DECIMAL sums and round to 6dp, so the trajectory is
    * row-order- and engine-independent (oracle-replayable); cells
    * that lose every vector keep their previous centroid. Returns the
    * (cell, carr) table the IVF/semDedup dataflows consume — the
    * "learned k-means quantizer slots into the same dataflow" path.
    */
  def kmeansQuantizer(corpus: DataFrame, idCol: String, vecCol: String,
                      numCells: Int, iters: Int): DataFrame =
    centDfOf(corpus.sparkSession,
      kmeansMap(corpus, idCol, vecCol, numCells, iters))

  /** Driver-map form of [[kmeansQuantizer]] — each Lloyd round is ONE
    * scan-fused assignment (no join, no shuffle beyond the update agg)
    * + ONE map-side-combined (cell, dim) aggregate.
    */
  private def kmeansMap(corpus: DataFrame, idCol: String, vecCol: String,
                        numCells: Int, iters: Int): Map[Int, Array[Double]] = {
    var cents = initCentroidMap(corpus, idCol, vecCol, numCells)
    var it = 0
    while (it < iters) {
      val updated = ivfAssign(corpus, idCol, vecCol, cents)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("j", "xv")))
        .groupBy(col("cell"), col("j"))
        .agg(round(
          sum(col("xv").cast(org.apache.spark.sql.types.DecimalType(38, 15)))
            .cast("double") / count(lit(1)).cast("double"), 6).as("c"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray)
        .toMap
      cents = cents ++ updated // absent cells keep the previous centroid
      it += 1
    }
    cents
  }

  /** Nearest-centroid cell per row against a (cell, carr) quantizer
    * table — the public face of the assignment dataflow. The table is
    * driver-bounded by construction (cells × dims), so it collapses to
    * a literal centroid array and the assignment scan-fuses.
    */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centDf: DataFrame): DataFrame =
    ivfAssign(corpus, idCol, vecCol, centMapOf(centDf))
      .select(col(idCol), col("cell"))

  /** (cell, carr) table → driver map; bounded at cells×dims doubles. */
  private def centMapOf(centDf: DataFrame): Map[Int, Array[Double]] =
    centDf.collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray)
      .toMap

  /** Nearest-centroid assignment (squared-L2 via the VecDot identity
    * ‖x−c‖² = x·x − 2x·c + c·c, ties to the lowest cell) — ONE
    * scan-fused `aggregate()` fold over the literal centroid array:
    * no row explosion, no shuffle, no window. At 100 TB with
    * numCells ~10⁴ this is the difference between a numCells× corpus
    * blow-up + full re-sort and a pure map stage. Fold order is
    * ascending cell with a strict `<`, so ties keep the lowest cell —
    * identical to the retired (dist, cell) window ranking; c·c is
    * pre-accumulated on the driver with VecDot's own sequential
    * double loop, so distances are bit-equal to the joined form.
    */
  private def ivfAssign(df: DataFrame, id: String, vecCol: String,
                        cents: Map[Int, Array[Double]]): DataFrame = {
    val scored = df.select(col(id), col(vecCol),
      vec_dot(col(vecCol), col(vecCol)).as("vv"))
    scored.select(col(id), col(vecCol),
      nearestCell(col(vecCol), col("vv"), cents).as("cell"))
  }

  /** Per-cell (dist, cell) structs — dist FIRST so `sort_array`'s
    * lexicographic struct order is exactly (dist asc, cell asc), the
    * argmin fold's total order. dist = (vv − 2·x·c) + c·c in the
    * exact arithmetic order of the retired join formulation; transform
    * computes each distance exactly once (dims-length work is 1× per
    * cell per row).
    */
  private def nearestCellDists(vec: Column, vv: Column,
                               cents: Map[Int, Array[Double]]): Column = {
    val centArr = array(cents.toSeq.sortBy(_._1).map { case (cell, c) =>
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      struct(lit(cell).as("cell"),
        array(c.toSeq.map(lit(_)): _*).as("carr"),
        lit(cc).as("cc"))
    }: _*)
    transform(centArr, cent =>
      struct(
        (vv - lit(2.0) * vec_dot(vec, cent.getField("carr")) +
          cent.getField("cc")).as("dist"),
        cent.getField("cell").as("cell")))
  }

  /** The fold expression: carry (bestDist, bestCell) across the
    * per-cell distance structs; ascending-cell build order + strict <
    * keeps the lowest cell on ties.
    */
  private def nearestCell(vec: Column, vv: Column,
                          cents: Map[Int, Array[Double]]): Column =
    aggregate(
      nearestCellDists(vec, vv, cents),
      struct(lit(Double.PositiveInfinity).as("dist"), lit(-1).as("cell")),
      (acc, cd) =>
        when(cd.getField("dist") < acc.getField("dist"), cd).otherwise(acc),
      acc => acc.getField("cell"))

  /** Simplified silhouette (centroid-based, Hruschka '04): per
    * vector, a = distance to its own centroid, b = distance to the
    * nearest OTHER centroid, s = (b − a)/max(a, b) — the O(n·k)
    * clustering-quality score that replaces the O(n²) pairwise
    * silhouette at scale. Entirely scan-fused: the same per-row
    * (dist, cell) struct array the argmin assignment folds over is
    * sort_array'd once, positions 1 and 2 ARE (a², own cell) and b²
    * (own centroid is the argmin, so a = min over all cells and b =
    * the runner-up) — no join, no shuffle, no second pass. Squared
    * distances clamp at 0 before the sqrt (exact-arithmetic
    * cancellation can go epsilon-negative), degenerate a = b = 0
    * scores 0, and the score rounds to 6dp — engine-exact.
    */
  def silhouette(corpus: DataFrame, idCol: String, vecCol: String,
                 centDf: DataFrame): DataFrame = {
    val cents = centMapOf(centDf)
    require(cents.size >= 2, "silhouette needs >= 2 cells")
    val scored = corpus.select(col(idCol), col(vecCol),
      vec_dot(col(vecCol), col(vecCol)).as("vv"))
    val sorted = sort_array(
      nearestCellDists(col(vecCol), col("vv"), cents))
    val zero = lit(0.0)
    val a = sqrt(greatest(element_at(sorted, 1).getField("dist"), zero))
    val b = sqrt(greatest(element_at(sorted, 2).getField("dist"), zero))
    scored.select(col(idCol),
      element_at(sorted, 1).getField("cell").as("cell"),
      round(when(greatest(a, b) > 0, (b - a) / greatest(a, b))
        .otherwise(0.0), 6).as("sil"))
  }

  /** Multi-probe IVF: like [[ivfTopK]], but each QUERY probes its
    * `nprobe` nearest cells — the standard IVF recall/cost knob
    * (candidates scale ~nprobe×, recall approaches brute force).
    * Only the tiny query side fans out (nprobe rows per query, still
    * broadcast); the corpus keeps exactly one cell per vector, so the
    * 100-TB shape is unchanged: scan-fused assignment + cell-keyed
    * equi-join.
    *
    * Probe order sorts (dist, cell) structs lexicographically —
    * `sort_array` on exact doubles, ties to the lowest cell, the same
    * total order the single-cell argmin fold uses.
    */
  def ivfTopKProbe(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, numCells: Int, k: Int,
                   nprobe: Int): DataFrame = {
    val cents = initCentroidMap(corpus, idCol, vecCol, numCells)
    val c = ivfAssign(corpus, idCol, vecCol, cents)
      .select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
        sqrt(vec_dot(col(vecCol), col(vecCol))).as("cn"), col("cell"))
    val qScored = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      vec_dot(col(vecCol), col(vecCol)).as("vv"))
    val q = broadcast(qScored
      .select(col("qid"), col("qv"), sqrt(col("vv")).as("qn"),
        explode(slice(sort_array(
          nearestCellDists(col("qv"), col("vv"), cents)), 1, nprobe))
          .as("probe"))
      .select(col("qid"), col("qv"), col("qn"),
        col("probe").getField("cell").as("cell")))
    val scored = c.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cell"), col("vec_id"),
        (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("cell"), col("rank"), col("vec_id"), col("cos"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings with the coarse quantizer,
    * then inside each cluster drop any vector that has an
    * earlier-id neighbor with cosine ≥ `tau` (the deterministic
    * greedy leader rule — the kept "leader" of a near-duplicate chain
    * is the lowest id). Returns one row per input:
    * (id, cell, keep 1/0, dup_of = lowest qualifying earlier id,
    * NULL for keeps).
    *
    * 100-TB shape: the centroid table is tiny and broadcast;
    * assignment is scan-fused; the witness search is a cell-keyed
    * equi-join (shuffle keyed on cell, never all-pairs). Within-cell
    * work is O(Σ|cell|²) — `numCells` is the knob that bounds it, so
    * at scale size cells to ~10³ vectors. Comparisons gate on the
    * 6dp-rounded cosine so the keep set is reproducible across
    * engines (no boundary-ulp flips).
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               numCells: Int, tau: Double, lloydIters: Int = 0): DataFrame = {
    val cents =
      if (lloydIters > 0)
        kmeansMap(corpus, idCol, vecCol, numCells, lloydIters)
      else initCentroidMap(corpus, idCol, vecCol, numCells)
    // assignment feeds both sides of the self-join and the final
    // left-join spine — one materialization (Pins-scoped release)
    val asgn = graft.core.Pins.pin(
      ivfAssign(corpus, idCol, vecCol, cents)
        .select(col(idCol), col("cell"), col(vecCol).as("v"),
          sqrt(vec_dot(col(vecCol), col(vecCol))).as("n")))
    val a = asgn.select(col(idCol).as("i"), col("cell"),
      col("v").as("iv"), col("n").as("inn"))
    val b = asgn.select(col(idCol).as("j"), col("cell"),
      col("v").as("jv"), col("n").as("jn"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("j") < col("i"))
      .filter(round(vec_dot(col("iv"), col("jv")) / (col("inn") * col("jn")), 6)
        >= lit(tau))
      .groupBy(col("i")).agg(min(col("j")).as("dup_of"))
    asgn.select(col(idCol), col("cell"))
      .join(dup.withColumnRenamed("i", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        when(col("dup_of").isNull, lit(1)).otherwise(lit(0)).as("keep"),
        col("dup_of"))
  }

  /** [[semDedup]] with AUTO-SIZED cells: numCells =
    * ceil(n / targetPerCell) from one count of the corpus, so the
    * within-cell O(Σ|cell|²) bound stays honest at ANY corpus size
    * without a caller-tuned constant — 500 vectors get 1 cell, a
    * 100-TB corpus of 10¹⁰ embeddings gets 10⁷ cells of ~10³. The
    * count is one column-pruned pass; everything downstream is the
    * parity dataflow unchanged.
    */
  def semDedupAuto(corpus: DataFrame, idCol: String, vecCol: String,
                   tau: Double, targetPerCell: Int = 1000,
                   lloydIters: Int = 0): DataFrame = {
    require(targetPerCell > 0, s"targetPerCell=$targetPerCell must be > 0")
    val n = corpus.select(col(idCol)).count()
    val cells = math.max(1L,
      (n + targetPerCell - 1) / targetPerCell).toInt
    semDedup(corpus, idCol, vecCol, cells, tau, lloydIters)
  }

  /** LSH-bucketed top-k: rank only within the query's bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dims: Int, numPlanes: Int, k: Int): DataFrame = {
    val bucket = lshBucket(col(vecCol), dims, numPlanes)
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("cn"), bucket.as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("qn"), bucket.as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("bucket"), col("vec_id"),
        (vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("bucket"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Per-group centroids of an embedding column, long-form
    * (group, dim, centroid, n). The explode is dims× rows into ONE
    * map-side-combined groupBy on (group, dim) — at 100 TB this is a
    * single shuffle of |groups|·dims partial sums per partition, never
    * per-vector traffic. Sums run through exact DECIMAL so the
    * centroid is independent of row order (float inputs widen to
    * double losslessly; the DECIMAL(38,15) window far exceeds unit-
    * scale embedding magnitudes).
    */
  def groupCentroids(emb: DataFrame, groupCol: String, vecCol: String): DataFrame =
    emb.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("grp"), (col("pos") + 1).as("dim"),
        col("v").cast("double").as("v"))
      .groupBy(col("grp"), col("dim"))
      .agg(
        (sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 15)))
          .cast("double") / count(lit(1)).cast("double")).as("centroid"),
        count(lit(1)).as("n"))
}
