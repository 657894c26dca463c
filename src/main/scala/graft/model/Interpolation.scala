package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Survival-curve interpolation (reference: `interpolate()` upsampling
  * of discrete survival before prediction —
  * src/elastic_surv/models/model_deephit.py:135-139,
  * model_logistic_hazard.py:113-117). Piecewise-linear through the
  * knot points, constant extrapolation past the last knot — expressed
  * as pure array expressions (codegen, no UDF).
  *
  * DOCUMENTED DEVIATION: pycox's `interpolate()` defaults to
  * CONSTANT-DENSITY interpolation (`scheme='const_pdf'`,
  * pycox.models.interpolation.InterpolateDiscrete) — the pmf mass of
  * each interval is spread uniformly over `sub` subdivision points,
  * which yields a piecewise-linear SURVIVAL curve evaluated on the
  * subdivided grid rather than a curve defined for arbitrary τ. This
  * engine interpolates S linearly between the original knots and
  * evaluates at ANY τ: the two agree exactly at subdivision points of
  * the const-pdf scheme (uniform pmf spread ⟺ linear S within an
  * interval), but pycox's step-then-index lookup between its
  * subdivision points is a staircase while this curve is continuous.
  * Values on the shared grid match; between subdivision points they
  * can differ by up to one sub-step of pmf mass.
  */
object Interpolation {

  /** Linear interpolation of per-row knot VALUES (array column,
    * same length as `knotTimes`) at time `tau`.
    *   τ <= first knot → first value; τ >= last knot → last value.
    */
  def linearAt(tau: Column, knotTimes: Array[Double], values: Column): Column = {
    val kt = array(knotTimes.map(lit(_)): _*)
    // i = count of knots <= tau  (1-based index of the segment end)
    val i = size(filter(kt, k => k <= tau))
    val n = knotTimes.length
    val t0 = element_at(kt, i)
    val t1 = element_at(kt, i + 1)
    val v0 = element_at(values, i)
    val v1 = element_at(values, i + 1)
    // CaseWhen evaluates branches lazily, so the out-of-bounds
    // element_at in the interpolating branch is never reached when
    // i == 0 or i == n.
    when(i === 0, element_at(values, 1))
      .when(i === n, element_at(values, n))
      .otherwise(v0 + (v1 - v0) * (tau - t0) / (t1 - t0))
  }
}
