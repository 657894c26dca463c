package graft.surv

import graft.core.StableOrder
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A typed row at the model boundary (encoded features + outcome). */
final case class SurvRow(rn: Long, x: Array[Float], t: Double, e: Int)

/** Split selector for [[SurvDataset.batchIn]]. */
sealed trait SplitSel
case object TrainSplit extends SplitSel
case object TestSplit extends SplitSel

/** The engine's dataset abstraction — the Spark re-expression of the
  * reference's `BasicDataset`/`ESDataset`/`PandasDataset`
  * (reference: src/elastic_surv/dataset.py:15-370).
  *
  * Construction (mirrors dataset.py:16-106 semantics):
  *   - feature inference: all columns minus {time, event}, SORTED by
  *     name — `np.setdiff1d` returns a sorted array (dataset.py:44-47);
  *   - schema validation: time/event must be numeric, a string dtype
  *     raises (dataset.py:58-62);
  *   - ordered 90/10 head/tail split over a stable total order
  *     (dataset.py:23,64-68) — NOT a random split;
  *   - one-hot specs fitted on the full frame for every string feature
  *     (dataset.py:78-106).
  *
  * Unlike the reference, the fitted spec is immutable and cached —
  * `copy()` in the reference refits encoders from scratch
  * (dataset.py:283-297), a pure perf artifact, not a semantic.
  *
  * All splits/batches stay DISTRIBUTED DataFrames (filters on `rn`,
  * which Catalyst pushes down); nothing is collected until the model
  * boundary.
  */
final case class SurvDataset(
    df: DataFrame, // carries StableOrder.RN
    timeCol: String,
    eventCol: String,
    features: Seq[String],
    oneHot: Seq[OneHotSpec],
    trainRatio: Double,
    n: Long) {

  import StableOrder.RN

  /** int(n * ratio) — floor, like the reference (dataset.py:64). */
  def trainLen: Long = (n * trainRatio).toLong
  def testLen: Long = n - trainLen

  def train: DataFrame = df.filter(col(RN) < trainLen)
  def test: DataFrame = df.filter(col(RN) >= trainLen)

  /** Batch window `[start, start+bs)` of a split in stable order —
    * the distributed analog of the reference's cursor window
    * `head(iter+bs).tail(bs)` (dataset.py:203). Epoch iteration at
    * scale happens per-partition inside the training aggregators, not
    * through a driver cursor.
    */
  // `start` is a GLOBAL row number, not a split-relative offset:
  // batching the test split starts at trainLen, not 0 (a 0-based
  // cursor over ds.test silently returns empty windows).
  def batch(split: DataFrame, start: Long, bs: Int): DataFrame =
    split.filter(col(RN) >= start && col(RN) < start + bs)

  /** Split-relative batching: window `start` is an offset WITHIN the
    * given split (0 = the split's first row) — the direct analog of
    * the reference's per-split cursor.
    */
  def batchIn(split: SplitSel, start: Long, bs: Int): DataFrame = {
    val base = split match {
      case TrainSplit => 0L
      case TestSplit => trainLen
    }
    batch(if (split == TrainSplit) train else test, base + start, bs)
  }

  /** Encoded feature names, in reference order: each categorical
    * feature replaced in-place in the (sorted) feature list by its
    * one-hot columns (dataset.py:100-106).
    */
  def encodedFeatures: Seq[String] = features.flatMap { f =>
    oneHot.find(_.column == f).map(_.outputCols).getOrElse(Seq(f))
  }
  def numFeatures: Int = encodedFeatures.size

  /** Apply all fitted one-hot specs (dataset.py:172-187). */
  def encode(d: DataFrame): DataFrame =
    oneHot.foldLeft(d)((acc, s) => s.transform(acc))

  /** Dense float feature vector + (t, e) target — the columnar analog
    * of the reference's tensorization (dataset.py:209-225).
    */
  def tensorized(d: DataFrame): DataFrame = {
    val enc = encode(d)
    enc.select(
      col(RN),
      array(encodedFeatures.map(c => col(c).cast(FloatType)): _*).as("x"),
      col(timeCol).cast(DoubleType).as("t"),
      col(eventCol).cast(IntegerType).as("e"))
  }

  def typedRows(d: DataFrame): Dataset[SurvRow] = {
    val spark = d.sparkSession
    import spark.implicits._
    tensorized(d).as[SurvRow]
  }
}

object SurvDataset {

  /** Build from any DataFrame with a caller-named unique order key.
    * Runs two tiny jobs: the stable-order count and the per-string-
    * feature distinct()s (encoder fits).
    */
  def fromDataFrame(
      df: DataFrame,
      orderKeys: Seq[Column],
      timeCol: String,
      eventCol: String,
      features: Option[Seq[String]] = None,
      trainRatio: Double = 0.9): SurvDataset = {

    val schema = df.schema
    def isNumeric(c: String): Boolean = schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }
    require(schema.fieldNames.contains(timeCol), s"missing time column $timeCol")
    require(schema.fieldNames.contains(eventCol), s"missing event column $eventCol")
    if (!isNumeric(timeCol))
      throw new IllegalArgumentException(
        s"Invalid time column dtype ${schema(timeCol).dataType} (must be numeric)")
    if (!isNumeric(eventCol))
      throw new IllegalArgumentException(
        s"Invalid event column dtype ${schema(eventCol).dataType} (must be numeric)")

    require(trainRatio > 0.0 && trainRatio <= 1.0,
      s"trainRatio must be in (0, 1], got $trainRatio")

    // np.setdiff1d semantics: sorted unique names minus {time, event}
    val feats = features.getOrElse(
      schema.fieldNames.toSeq.diff(Seq(timeCol, eventCol)).sorted)
    // explicit feature lists fail here with the column NAMED, not at
    // first use deep inside an encoder/tensorize analysis error
    feats.foreach(f => require(schema.fieldNames.contains(f),
      s"feature column '$f' not in ${schema.fieldNames.toSeq}"))

    val (withRn, n) = StableOrder.withRowNumber(df, orderKeys)

    // Fit encoders on the PERSISTED row-numbered frame (same rows) in
    // ONE job: fitting on `df` per column would re-execute the whole
    // upstream pipeline once per string feature instead of reading the
    // cache the stable-order pass just populated.
    val specs = OneHotSpec.fitAll(withRn,
      feats.filter(f => schema(f).dataType == StringType))

    SurvDataset(withRn, timeCol, eventCol, feats, specs, trainRatio, n)
  }

  def fromParquet(
      spark: SparkSession,
      path: String,
      orderKeys: Seq[String],
      timeCol: String,
      eventCol: String,
      features: Option[Seq[String]] = None,
      trainRatio: Double = 0.9): SurvDataset =
    fromDataFrame(spark.read.parquet(path), orderKeys.map(col),
      timeCol, eventCol, features, trainRatio)
}
