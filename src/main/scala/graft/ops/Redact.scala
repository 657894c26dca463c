package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern scrubbing — the PII-redaction plumbing of a training-data
  * pipeline: replace every match of the configured patterns with a
  * mask token and report per-pattern match counts (the audit trail a
  * compliance pass needs). Pure codegen'd regexp expressions fused
  * into the scan — per-row cost O(len), no shuffle, no UDF; at 100 TB
  * this runs at parquet-scan speed.
  *
  * Patterns are kept RE2-compatible (no backrefs/lookahead) so the
  * DuckDB oracle executes the IDENTICAL regex — and so the operator
  * ports to RE2-based scanners unchanged.
  */
object Redact {

  /** email-shaped token (simplified RFC pattern, case-insensitive
    * classes spelled out — identical semantics in Java regex + RE2)
    */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** runs of >= `2` digits — phone/account/id-number shaped content */
  val DigitRun = "[0-9]{2,}"

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Scrub `textCol`: returns the input columns plus
    * `<textCol>_scrubbed`, `n_emails`, `n_digit_runs`.
    */
  def scrub(df: DataFrame, textCol: String,
            mask: String = "<redacted>"): DataFrame =
    df.withColumn("n_emails", countMatches(col(textCol), Email))
      .withColumn("n_digit_runs", countMatches(col(textCol), DigitRun))
      .withColumn(s"${textCol}_scrubbed",
        regexp_replace(regexp_replace(col(textCol), Email, mask),
          DigitRun, mask))
}
