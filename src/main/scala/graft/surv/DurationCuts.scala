package graft.surv

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Discrete-time label transform: equidistant duration cuts fitted on
  * the train split, mapping continuous time to a bin index.
  *
  * Mirrors pycox `LabTransDiscreteTime` with equidistant cuts as used
  * by the reference (reference: src/elastic_surv/dataset.py:122-132,
  * models/model_deephit.py:101-103, model_logistic_hazard.py:95-97):
  * cuts = linspace(tmin, tmax, numDurations) over the TRAIN outcome.
  *
  * Index semantics (fixed, oracle-checkable):
  *   idx = clamp(floor((t - tmin) / step), 0, k-1),
  *   step = (tmax - tmin) / (k - 1)
  * i.e. the index of the highest cut ≤ t for on-grid values. Pure
  * +,-,*,/ double arithmetic → bit-identical across engines.
  *
  * Event-flag flavors: pycox's `LabTransDiscreteTime.transform`
  * additionally REWRITES THE EVENT INDICATOR for rows beyond the
  * fitted grid (pycox.preprocessing.label_transforms: durations past
  * the last cut are clamped and the event flag is set to 0 —
  * "administrative censoring at the end of the grid").
  * [[eventColPycox]] reproduces that flavor; the engine DEFAULT keeps
  * the original flag (a beyond-grid event stays an event in the last
  * bin — the other convention in the literature, and the one with no
  * train/test asymmetry). The flavors differ on at most the
  * beyond-grid rows.
  */
final case class DurationCuts(cuts: Array[Double]) {
  def k: Int = cuts.length
  def tmin: Double = cuts.head
  def tmax: Double = cuts.last
  def step: Double = (tmax - tmin) / (k - 1).toDouble

  require(tmax > tmin,
    s"DurationCuts: degenerate time range [$tmin, $tmax] — need >= 2 " +
      "distinct train times (step would be 0 and indexCol would yield " +
      "NaN -> null indices downstream)")

  def indexCol(t: Column): Column = {
    val raw = floor((t.cast("double") - lit(tmin)) / lit(step)).cast("int")
    least(greatest(raw, lit(0)), lit(k - 1))
  }

  /** pycox `LabTransDiscreteTime` event flavor: administrative
    * censoring at the end of the fitted grid — beyond-grid rows keep
    * the clamped last-bin index but the event flag becomes 0.
    */
  def eventColPycox(t: Column, e: Column): Column =
    when(t.cast("double") > lit(tmax), lit(0)).otherwise(e)

  /** The grid as a Column literal (for survival-matrix expressions). */
  def gridCol: Column = array(cuts.map(lit(_)): _*)
}

object DurationCuts {
  def fit(train: DataFrame, timeCol: String, numDurations: Int): DurationCuts = {
    require(numDurations >= 2, "numDurations must be >= 2")
    val Row(tmin: Double, tmax: Double) = train
      .agg(min(col(timeCol).cast("double")), max(col(timeCol).cast("double")))
      .head()
    DurationCuts(linspace(tmin, tmax, numDurations))
  }

  /** numpy-style linspace: k equidistant points, endpoints inclusive. */
  def linspace(lo: Double, hi: Double, k: Int): Array[Double] = {
    val step = (hi - lo) / (k - 1).toDouble
    Array.tabulate(k)(i => if (i == k - 1) hi else lo + i * step)
  }
}
