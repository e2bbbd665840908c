package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared test fixture builders (FIXTURES.md §A2 shapes). */
object Fixtures {
  import TestSpark.spark.implicits._

  /** Staged (cleaned+enriched) paper batch: one row per paper with the
    * authors_merged struct array. */
  def staged(rows: Seq[(String, String, Int, String, String, String, Int,
      Seq[(String, String, String, String, String)])]): DataFrame =
    rows.toDF("id", "subject", "published-year", "type", "container-title",
        "publisher", "is-referenced-by-count", "am")
      .withColumn("doi", concat(lit("10.0/"), col("id")))
      .withColumn("title", concat(lit("T-"), col("id")))
      .withColumn("latest_version", lit("v1"))
      .withColumn("authors_merged", col("am").cast(
        "array<struct<family:string,given:string,affiliation:string," +
          "gender:string,full_name:string>>"))
      .drop("am")
}
