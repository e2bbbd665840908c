package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module; each key has (where SQL can
  * express it) a DuckDB oracle twin in `oracleSql`. Modules:
  * [[queries.RelationalQueries]] filters/joins/aggs/windows/dedup/upsert.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    BiQueries,
    TextPipelineQueries,
    SimilarityQueries,
    GraphQueries,
    EventQueries,
    AnalyticsQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's "ranking papers by citation count"
    * (dags/sql/queries.sql:43-45) over `orders`. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_rank_orders_by_price")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
