package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns.normalise

/** The reference's cleaning stage (`clean_dataframe`,
  * /root/reference/dags/transforms.py:37-48) as pure DataFrame→DataFrame
  * functions over the raw-paper schema (FIXTURES.md §A1). Operator order
  * matches the reference pipeline; Catalyst re-derives the early-filter /
  * early-projection optimizations the reference hand-coded.
  */
object Cleaning {

  /** P1 — drop withdrawn papers. `re.match` semantics → anchored rlike
    * (transforms.py:8-16). Null abstracts are kept, as in Pandas. */
  val withdrawnPattern =
    "^\\s+(This|The) (paper|submission|manuscript|work) (has been|is being|is) withdrawn"

  def removeWithdrawn(df: DataFrame): Column =
    !coalesce(col("abstract").rlike(withdrawnPattern), lit(false))

  /** P2 — the reference's dropped columns (transforms.py:39). */
  val droppedColumns = Seq("comments", "abstract", "license", "update_date", "report-no")

  /** F13 — keep only the latest version tag (transforms.py:32-35).
    * `try_element_at`: an empty versions array yields null rather than
    * throwing under ANSI mode. */
  def latestVersion(versions: Column): Column =
    try_element_at(versions, lit(-1)).getField("version")

  /** F2 — newline strip on the reference's three columns
    * (transforms.py:42-44). */
  private def noNl(c: Column): Column = regexp_replace(c, "\n", "")

  /** D1 — dedup on normalise(title)+normalise(authors), keep-first in a
    * deterministic order (transforms.py:19-21; Pandas keeps input order —
    * we key on the given tie-break column, SURVEY §7 risk 4). */
  def dedupKey(title: Column, authors: Column): Column =
    concat(normalise(title), normalise(authors))

  /** F14 — authors_parsed [[family, given, suffix, affil...]] →
    * array<struct<family, given, affiliation>> with empty affiliations
    * filtered (transforms.py:23-30). */
  def extractNamesAndAffiliations(authorsParsed: Column): Column =
    transform(authorsParsed, a => struct(
      element_at(a, 1).as("family"),
      element_at(a, 2).as("given"),
      filter(slice(a, 3, Int.MaxValue - 3), x => length(x) > 0)
        .as("affiliation")))

  /** The full cleaning pipeline (transforms.py:37-48 order):
    * withdrawn-filter → drop columns → latest version → dropna(authors)
    * (the *intended* semantics of the reference's no-op inplace bug,
    * SURVEY §2.2 P3) → strip newlines → dedup → normalize author structs.
    * `tieBreak` orders the keep-first dedup deterministically. */
  def cleanAll(df: DataFrame, tieBreak: Column): DataFrame = {
    val kept = df
      .filter(removeWithdrawn(df))
      .drop(droppedColumns: _*)
      .withColumn("latest_version", latestVersion(col("versions")))
      .drop("versions")
      .na.drop(Seq("authors"))
      .withColumn("title", noNl(col("title")))
      .withColumn("authors", noNl(col("authors")))
      .withColumn("journal-ref", noNl(col("journal-ref")))
    val w = Window
      .partitionBy(dedupKey(col("title"), col("authors")))
      .orderBy(tieBreak)
    kept
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("authors_struct",
        extractNamesAndAffiliations(col("authors_parsed")))
  }

  /** P4 — oversized-title guard applied before staging
    * (api_to_neo4j.py:126-129). */
  def titleLengthFilter(df: DataFrame, maxLen: Int = 1000): DataFrame =
    df.filter(length(col("title")) <= maxLen)
}
