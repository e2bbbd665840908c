package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns.md5Hash54

/** Dataset-mixing primitives: deterministic sampling for up/down-weighting
  * sources when assembling a training mix. */
object Sampling {

  /** Deterministic stratified keep-filter: a row survives iff the salted
    * 54-bit md5 hash of its stable key, mod 10⁴, falls under its
    * stratum's threshold (`rate · 10⁴`, rounded ONCE on the driver and
    * embedded as an integer literal — [[stratifiedSql]] embeds the same
    * integers, so both engines compare integers and cannot drift on
    * float rounding). Properties a mixing gate needs at 100 TB:
    * reproducible across runs/engines (no RNG state — rerunning the
    * pipeline keeps the same docs), embarrassingly parallel (a narrow
    * scan+filter, no shuffle, no per-stratum pass), rate-exact to 1e-4
    * in expectation, and composable (a second pass with a higher rate
    * and the same salt keeps a SUPERSET — hash thresholds nest, which
    * per-row RNG cannot do). Unknown strata drop (threshold 0) — the
    * conservative default. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], salt: String): DataFrame = {
    val bucket =
      md5Hash54(concat(lit(salt + ":"), key.cast("string"))) % 10000L
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(stratum === s, lit((r * 10000).round)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** DuckDB twin of [[stratified]]'s predicate appended to `selectSql`
    * (same salt, same integer thresholds, same hash derivation). */
  def stratifiedSql(selectSql: String, keyCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String): String = {
    val cases = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN $stratumCol = '$s' THEN ${(r * 10000).round}"
    }.mkString(" ")
    s"""$selectSql
       |WHERE CAST(('0x' || substr(md5('$salt:' || CAST($keyCol AS VARCHAR)), 1, 14)) AS BIGINT) % 10000
       |      < CASE $cases ELSE 0 END""".stripMargin
  }
}
