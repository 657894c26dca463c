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
  * Two flavors ship:
  *   - [[linearAt]]: S interpolated linearly between the original
  *     knots, evaluated at ANY τ (continuous curve);
  *   - [[constPdf]]/[[constPdfTimes]]: pycox's default
  *     `interpolate(sub)` scheme (`scheme='const_pdf'`,
  *     pycox.models.interpolation.InterpolateDiscrete) — the pmf mass
  *     of each interval is spread uniformly over `sub` subdivision
  *     points, producing the subdivided DISCRETE grid pycox returns.
  * The two agree exactly at the subdivision points (uniform pmf
  * spread ⟺ linear S within an interval); between subdivision points
  * pycox's downstream step lookup is a staircase while [[linearAt]]
  * is continuous — that residual difference is inherent to returning
  * a grid vs a curve.
  */
object Interpolation {

  /** Linear interpolation of per-row knot VALUES (array column,
    * same length as `knotTimes`) at time `tau`.
    *   τ <= first knot → first value; τ >= last knot → last value.
    */
  def linearAt(tau: Column, knotTimes: Array[Double], values: Column): Column = {
    val kt = array(knotTimes.map(lit(_)): _*)
    val n = knotTimes.length
    // i = count of knots <= tau (1-based index of the segment end);
    // let-bound — it is referenced from six places below and contains
    // an O(K) filter that would otherwise run per reference.
    graft.functions.Let.bind(size(filter(kt, k => k <= tau))) { i =>
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

  /** Time points of the pycox `interpolate(sub)` subdivided grid:
    * (k−1)·sub + 1 points, each interval split into `sub` equal
    * steps (endpoints are the original knots, bit-exactly).
    */
  def constPdfTimes(knotTimes: Array[Double], sub: Int): Array[Double] =
    Array.tabulate((knotTimes.length - 1) * sub + 1) { m =>
      val q = m / sub
      val r = m % sub
      if (r == 0) knotTimes(q)
      else knotTimes(q) +
        (knotTimes(q + 1) - knotTimes(q)) * (r.toDouble / sub.toDouble)
    }

  /** Survival values on the pycox const-pdf subdivided grid: spreading
    * each interval's pmf mass uniformly over `sub` steps is exactly
    * linear interpolation of S within the interval, so
    *   out[m] = v_q + (v_{q+1} − v_q) · (r / sub),  q = m / sub, r = m % sub
    * for a length-k `values` array. Pure array expression (codegen).
    */
  def constPdf(values: Column, k: Int, sub: Int): Column =
    // values (often a whole curve expression) is let-bound: it is
    // referenced twice per subdivision point otherwise.
    graft.functions.Let.bind(values) { vs =>
      transform(sequence(lit(0), lit((k - 1) * sub)), m => {
        val q = floor(m / lit(sub)).cast("int")
        val r = m - q * lit(sub)
        val v0 = element_at(vs, q + 1)
        when(r === 0, v0).otherwise(
          v0 + (element_at(vs, q + 2) - v0) *
            (r.cast("double") / lit(sub.toDouble)))
      })
    }
}
