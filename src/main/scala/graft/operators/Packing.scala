package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Pins.PinnedOps

/** Sequence packing for pre-training: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-budget
  * training sequences ("concatenate-then-chunk" — documents may straddle
  * a boundary, the standard EOS-joined formulation).
  *
  * The naive expression is `SUM(n) OVER (ORDER BY id)` — an
  * UNPARTITIONED running-sum window that drags the whole corpus into one
  * partition, exactly the scale-killer [[Ranking]] exists to avoid. Same
  * cure, adapted to a running sum over ROWS (not distinct values):
  *  1. range-partition by the order key; running sum LOCALLY per
  *     partition (window partitioned by `spark_partition_id()`);
  *  2. per-partition totals → running offsets via the triangular
  *     self-join over `parts` single-row groups;
  *  3. stream offset = local prior + partition offset; `seq_id` =
  *     `offset DIV budget`.
  * Unlike Ranking's pins, the pinned frame here is the FULL input (the
  * running sum needs every row, not just distinct values) — one
  * materialization of the working set, the price of boundary consistency
  * (RangePartitioner samples; two independent executions could split
  * rows differently and corrupt the offsets). At cluster scale this is
  * one extra write of the partition column, not a shuffle of new data.
  */
object Packing {

  /** Assign each document its stream offset and training-sequence id.
    * `df` must carry unique `idCol` (the deterministic concatenation
    * order) and a non-null `tokenCol` (per-doc token count). Output:
    * input columns + `stream_offset` (tokens before this doc) +
    * `seq_id` (= stream_offset DIV budget). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, parts: Int = 32): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    val local = df
      .repartitionByRange(parts, col(idCol).asc)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_prior", coalesce(
        sum(col(tokenCol)).over(Window.partitionBy(col("_pid"))
          .orderBy(col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .pinned // pin ONE range partitioning for both consumers
    val counts = local.groupBy(col("_pid"))
      .agg(sum(col(tokenCol)).as("_n"))
    val offsets = counts.select(col("_pid"), col("_n"))
      .join(counts.select(col("_pid").as("_q"), col("_n").as("_qn")),
        col("_q") < col("_pid"), "left")
      .groupBy(col("_pid"))
      .agg(coalesce(sum(col("_qn")), lit(0L)).as("_off"))
    local.join(offsets, "_pid")
      .withColumn("stream_offset", col("_prior") + col("_off"))
      .withColumn("seq_id", expr(s"stream_offset DIV $budget"))
      .drop("_pid", "_prior", "_off")
  }

  /** DuckDB twin of [[packSequences]] — the single-window formulation the
    * two-pass plan is bit-identical to. */
  def packSequencesSql(selectSql: String, idCol: String, tokenCol: String,
      budget: Long): String =
    s"""SELECT *,
       |  CAST(COALESCE(SUM($tokenCol) OVER (ORDER BY $idCol
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS stream_offset,
       |  CAST(COALESCE(SUM($tokenCol) OVER (ORDER BY $idCol
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $budget AS BIGINT)
       |    AS seq_id
       |FROM ($selectSql)""".stripMargin
}
