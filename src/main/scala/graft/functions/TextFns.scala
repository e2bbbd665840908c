package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Scalar / string / array column functions — the reference's cleaning and
  * enrichment helpers re-expressed as pure Catalyst `Column` expressions
  * (SURVEY.md §2.8 F1–F23). Everything here stays inside whole-stage
  * codegen: no UDFs.
  */
object TextFns {

  /** F1 `normalise` — keep alphanumerics, lowercase. The reference's dedup
    * key (`/root/reference/dags/transforms.py:5-6`). ASCII character class so
    * the DuckDB oracle (RE2) and Spark (java.util.regex) agree. */
  def normalise(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9]", ""))

  /** F2 — strip embedded newlines (`dags/transforms.py:42-44`). */
  def stripNewlines(c: Column): Column = regexp_replace(c, "\n", "")

  /** F3 — non-alphanumerics to spaces, for search keys
    * (`dags/openalex.py:4-9`). */
  def cleanForSearch(c: Column): Column =
    regexp_replace(c, "[^a-zA-Z0-9]", " ")

  /** F6 — null → 'Unknown' fill (`dags/pop_DWH.py:62-63`). */
  def fillUnknown(c: Column): Column = coalesce(c, lit("Unknown"))

  /** F7 — year normalization: "2004.0" → 2004, 'Unknown'/garbage → 0
    * (`dags/pop_DWH.py:64-65,78`). The digit guard keeps the cast off
    * non-numeric input — under Spark 4's default ANSI mode a bare
    * cast("int") of "Unknown" throws instead of yielding null. */
  def normalizeYear(c: Column): Column = {
    val tok = split(c, "\\.").getItem(0)
    coalesce(when(tok.rlike("^-?[0-9]+$"), tok.cast("int")), lit(0))
  }

  /** F9 — full-name concat (`dags/enrich.py:69`). */
  def fullName(given: Column, family: Column): Column =
    concat_ws(" ", given, family)

  /** F10 — first token before space (`dags/enrich.py:49-52`). */
  def firstToken(c: Column): Column = split(c, " ").getItem(0)

  /** Whitespace tokenization — the engine's standard token stream for the
    * text-analysis operators. `filter` drops the empty string a leading
    * separator would produce. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Deterministic 54-bit hash of a string via md5 — *reproducible across
    * engines* (DuckDB: `CAST('0x'||substr(md5(x),1,14) AS BIGINT)`), unlike
    * Spark's Murmur3 `hash()`. Used wherever the oracle must re-derive the
    * same hash. 54 bits keeps it positive and exact in a double if a sink
    * ever goes through JSON. */
  def md5Hash54(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast(LongType)

  /** Distinct character n-gram shingles of a document — input to MinHash /
    * Jaccard near-dup. Pure higher-order functions (no explode at this
    * stage; callers explode only when building the inverted index). */
  def shingles(c: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(
          sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
          i => c.substr(i, lit(n))),
        s => length(s) === n))

  /** Exact-decimal sum of a 2-decimal double column, returned as double.
    * Bit-identical between Spark and DuckDB regardless of row order —
    * decimal addition is associative where float addition is not. The
    * pattern every money-sum in the oracle-checked queries uses. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact-decimal average: exact decimal sum → double, then ONE double
    * divide by the count. (Decimal÷long in Spark rounds at the result
    * scale, which diverges from DuckDB's — a single IEEE divide of two
    * exact operands does not.) */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(c)
}
