package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 15 BI queries (`/root/reference/dags/sql/queries.sql`)
  * as parameterized functions over the loaded star schema
  * ([[Warehouse.State]]) — the exact query surface a user of the
  * reference runs today, same shapes (star join → agg → DENSE_RANK →
  * order), with the domain `LIKE` pattern and year range as parameters.
  *
  * Authoring note: the reference's `COUNT(...) OVER (PARTITION BY …)` +
  * `DISTINCT` idiom is written as groupBy-agg (SURVEY §2.4 A4 —
  * semantically identical, one shuffle cheaper).
  */
object BiQueriesWarehouse {
  import Warehouse.State

  private def ranked(df: DataFrame, by: Column, out: Column*): DataFrame =
    df.withColumn("ranking", dense_rank().over(Window.orderBy(by.desc)))
      .select(col("ranking") +: out: _*)

  /** dim_author ⋈ bridge ⋈ fact (⋈ dim_domain with LIKE filter). */
  private def authorLeg(s: State, domainPattern: Option[String]): DataFrame = {
    val base = s.dimAuthor
      .join(s.bridgeAuthor, "author_key")
      .join(s.fact, "author_group_key")
    domainPattern match {
      case Some(p) => base
        .join(broadcast(s.dimDomain.filter(col("scientific_domain").like(p))),
          "domain_key")
      case None => base
    }
  }

  private def affiliationLeg(s: State): DataFrame =
    s.dimAffiliation.filter(col("affiliation_name") =!= "Unknown")
      .join(s.bridgeAffiliation, "affiliation_key")
      .join(s.fact, "affiliation_group_key")

  private def venueLeg(s: State): DataFrame =
    s.dimVenue.join(s.fact, "venue_key")

  private def yearLeg(s: State): DataFrame =
    s.dimYear.join(s.fact, "year_key")

  /** Q1 — rank authors in a domain by paper count (queries.sql:4-11). */
  def q1(s: State, domainPattern: String): DataFrame =
    ranked(authorLeg(s, Some(domainPattern))
      .groupBy(col("author_key"), col("full_name"))
      .agg(count(col("title")).as("count")),
      col("count"), col("full_name"))

  /** Q2 — rank authors by total citations (queries.sql:14-21). */
  def q2(s: State, domainPattern: String): DataFrame =
    ranked(authorLeg(s, Some(domainPattern))
      .groupBy(col("author_key"), col("full_name"))
      .agg(sum(col("citation_count")).as("sum")),
      col("sum"), col("full_name"))

  /** Q3/Q4 — rank authors by h-/g-index (queries.sql:24-42). */
  def q3(s: State, domainPattern: String): DataFrame =
    ranked(authorLeg(s, Some(domainPattern))
      .select(col("full_name"), col("h_index"), col("scientific_domain")).distinct(),
      col("h_index"), col("h_index"), col("full_name"), col("scientific_domain"))

  def q4(s: State, domainPattern: String): DataFrame =
    ranked(authorLeg(s, Some(domainPattern))
      .select(col("full_name"), col("g_index"), col("scientific_domain")).distinct(),
      col("g_index"), col("g_index"), col("full_name"), col("scientific_domain"))

  /** Q5 — rank papers by citation count (queries.sql:43-45). */
  def q5(s: State): DataFrame =
    ranked(s.fact, col("citation_count"), col("citation_count"), col("title"))

  /** Q6/Q7 — rank affiliations by paper count (optionally year-bounded,
    * queries.sql:48-65). */
  def q6(s: State, years: Option[(Int, Int)] = None): DataFrame = {
    val base = years match {
      case Some((lo, hi)) => affiliationLeg(s)
        .join(broadcast(s.dimYear.filter(col("publication_year").between(lo, hi))
          .select(col("year_key"))), "year_key")
      case None => affiliationLeg(s)
    }
    ranked(base.groupBy(col("affiliation_key"), col("affiliation_name"))
      .agg(count(col("title")).as("count")),
      col("count"), col("affiliation_name"))
  }

  /** Q8 — rank affiliations by total citations (queries.sql:68-74). */
  def q8(s: State): DataFrame =
    ranked(affiliationLeg(s)
      .groupBy(col("affiliation_key"), col("affiliation_name"))
      .agg(sum(col("citation_count")).as("sum")),
      col("sum"), col("sum"), col("affiliation_name"))

  /** Q9 — rank affiliations by ROUND(AVG(citations)) (queries.sql:77-83). */
  def q9(s: State): DataFrame =
    ranked(affiliationLeg(s)
      .groupBy(col("affiliation_name"))
      .agg(round(avg(col("citation_count"))).as("average")),
      col("average"), col("affiliation_name"), col("average"))

  /** Q10–Q12 — venue ranks by count / citations / rounded average
    * (queries.sql:86-104). */
  def q10(s: State): DataFrame =
    ranked(venueLeg(s).groupBy(col("pub_venue"), col("publisher"))
      .agg(count(col("title")).as("count")),
      col("count"), col("count"), col("pub_venue"), col("publisher"))

  def q11(s: State): DataFrame =
    ranked(venueLeg(s).groupBy(col("pub_venue"), col("publisher"))
      .agg(sum(col("citation_count")).as("sum")),
      col("sum"), col("sum"), col("pub_venue"), col("publisher"))

  def q12(s: State): DataFrame =
    ranked(venueLeg(s).groupBy(col("pub_venue"))
      .agg(round(avg(col("citation_count"))).as("average")),
      col("average"), col("average"), col("pub_venue"))

  /** Q13 — top venues within a domain (queries.sql:107-113). */
  def q13(s: State, domainPattern: String): DataFrame =
    ranked(venueLeg(s)
      .join(broadcast(s.dimDomain.filter(col("scientific_domain").like(domainPattern))),
        "domain_key")
      .groupBy(col("pub_venue"))
      .agg(count(col("title")).as("count")),
      col("count"), col("count"), col("pub_venue"))

  /** Q14 — years with most papers (queries.sql:116-120). */
  def q14(s: State): DataFrame =
    ranked(yearLeg(s).groupBy(col("publication_year"))
      .agg(count(col("title")).as("count")),
      col("count"), col("count"), col("publication_year"))

  /** Q15 — per-year histogram for a domain over a year range, ordered by
    * year ASC (queries.sql:123-129). */
  def q15(s: State, domainPattern: String, yearLo: Int, yearHi: Int): DataFrame =
    yearLeg(s)
      .filter(col("publication_year").between(yearLo, yearHi))
      .join(broadcast(s.dimDomain.filter(col("scientific_domain").like(domainPattern))),
        "domain_key")
      .groupBy(col("publication_year"))
      .agg(count(col("title")).as("count_papers"))
      .orderBy(col("publication_year"))

  /** All 15 with the reference's own literal parameters. */
  def all(s: State): Map[String, DataFrame] = Map(
    "q1" -> q1(s, "%physics%"), "q2" -> q2(s, "%physics%"),
    "q3" -> q3(s, "%Physics%"), "q4" -> q4(s, "%Physics%"),
    "q5" -> q5(s),
    "q6" -> q6(s), "q7" -> q6(s, Some(2000 -> 2022)),
    "q8" -> q8(s), "q9" -> q9(s),
    "q10" -> q10(s), "q11" -> q11(s), "q12" -> q12(s),
    "q13" -> q13(s, "%math%"), "q14" -> q14(s),
    "q15" -> q15(s, "%math%", 2010, 2022))
}
