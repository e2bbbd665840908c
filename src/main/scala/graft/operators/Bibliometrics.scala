package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** h-index / g-index / Euclidean index as *engine-native* grouped
  * aggregates — the reference's vendored scholarmetrics NumPy routines
  * (`/root/reference/dags/metrics.py:56-143`) re-expressed as window
  * functions so they run distributed, one shuffle per metric, no
  * `collect_list` buffering of a whole group in one row.
  *
  * Definitions transcribed from the reference:
  *  - h  = Σᵢ [cᵢ ≥ i]   over citations sorted desc, 1-based i
  *    (`metrics.py:137-143`; NaN/null citations removed)
  *  - g  = Σᵢ [cumsumᵢ ≥ i²]  over *nonzero* citations sorted desc
  *    (`metrics.py:91-96`)
  *  - e  = sqrt(Σ c²)  (`metrics.py:12-53`)
  *
  * Both indicator sums are invariant to tie order within equal citation
  * counts, so the row_number tie-break only serves determinism of the
  * intermediate, not the result.
  *
  * Scale: the window partitions by the group key — per-author state is a
  * rank counter and a running sum, spilled by Spark's WindowExec if a
  * single author's corpus is huge. No global window anywhere.
  */
object Bibliometrics {

  /** df(group, cites) → (group, h_index). */
  def hIndex(df: DataFrame, group: Column, cites: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(cites.desc, tieBreak)
    df.filter(cites.isNotNull)
      .withColumn("rn", row_number().over(w))
      .groupBy(group.as("grp"))
      .agg(coalesce(max(when(cites >= col("rn"), col("rn"))), lit(0))
        .cast("int").as("h_index"))
  }

  /** df(group, cites) → (group, g_index). Zeros dropped per the reference. */
  def gIndex(df: DataFrame, group: Column, cites: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(cites.desc, tieBreak)
    val nz = df.filter(cites.isNotNull && cites > 0)
    nz.withColumn("rn", row_number().over(w))
      .withColumn("cum", sum(cites).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(group.as("grp"))
      .agg(coalesce(sum(when(col("cum") >= col("rn") * col("rn"), 1)), lit(0))
        .cast("int").as("g_index"))
  }

  /** df(group, cites) → (group, euclidean_index). */
  def euclidean(df: DataFrame, group: Column, cites: Column): DataFrame =
    df.filter(cites.isNotNull)
      .groupBy(group.as("grp"))
      .agg(sqrt(sum(cites * cites)).as("euclidean_index"))
}
