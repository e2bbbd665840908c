package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the standard pre-training redaction pass: URLs,
  * emails, IPv4 addresses and international phone numbers replaced by
  * typed placeholders, with per-class redaction counts kept as the audit
  * trail. Pure `Column` regex expressions, one narrow pass, fully
  * codegen'd; patterns are written in the syntax subset java.util.regex
  * and RE2/DuckDB share (no lookaround, no backrefs — the same contract
  * as [[TextAnalysis.bpePattern]]), and the SQL twin is generated from
  * the SAME pattern constants so the engines cannot drift.
  *
  * Classes are scrubbed in a fixed order (URL → email → IP → phone) and
  * each class is COUNTED on the text as it stands after the previous
  * class was scrubbed — an email inside a URL counts once, as a URL.
  */
object Pii {

  /** (class, pattern, placeholder), applied in order. */
  val classes: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^ ]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "\\+[0-9]{7,12}", "<PHONE>"))

  /** Per-doc scrub: `doc_id`, one `n_<class>` count per class (counted
    * stage-wise, see object doc), and the fully scrubbed text. */
  def scrub(df: DataFrame, id: Column, text: Column): DataFrame = {
    // stage-wise fold: each class counts on, then scrubs, the previous
    // stage's text — materialized per stage so Catalyst's subexpression
    // elimination isn't needed to avoid re-running the regex chain
    // (counts and the next stage both read the aliased column)
    val start = df.select(id.as("doc_id"), text.as("t0"))
    val (scrubbed, _) = classes.zipWithIndex.foldLeft((start, "t0")) {
      case ((acc, tcol), ((cls, pat, ph), i)) =>
        val next = s"t${i + 1}"
        (acc.withColumn(s"n_$cls",
            size(regexp_extract_all(col(tcol), lit(pat), lit(0))))
          .withColumn(next, regexp_replace(col(tcol), pat, ph)), next)
    }
    scrubbed.select(
      (col("doc_id") +: classes.map { case (cls, _, _) => col(s"n_$cls") })
        :+ col(s"t${classes.length}").as("scrubbed"): _*)
  }

  /** DuckDB twin over `tbl(doc_id, text)` — generated from [[classes]];
    * `'g'` flag: DuckDB's regexp_replace is first-match-only by default
    * where Spark's replaces all. */
  def scrubSql(tbl: String): String = {
    // DuckDB single-quoted literals are raw (no backslash processing) —
    // only quote-escape, like the bpePattern twin
    def esc(p: String) = p.replace("'", "''")
    val stages = classes.zipWithIndex.map { case ((cls, pat, ph), i) =>
      s"""s${i + 1} AS (SELECT * EXCLUDE (t$i),
         |    len(regexp_extract_all(t$i, '${esc(pat)}')) AS n_$cls,
         |    regexp_replace(t$i, '${esc(pat)}', '$ph', 'g') AS t${i + 1}
         |  FROM s$i)""".stripMargin
    }
    val cols = classes.map { case (cls, _, _) => s"n_$cls" }.mkString(", ")
    s"""WITH s0 AS (SELECT doc_id, text AS t0 FROM $tbl),
       |${stages.mkString(",\n")}
       |SELECT doc_id, $cols, t${classes.length} AS scrubbed
       |FROM s${classes.length}""".stripMargin
  }
}
