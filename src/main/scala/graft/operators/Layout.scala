package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the lake side of the engine: Z-order
  * (Morton) clustering — the multi-column data-skipping layout
  * Delta/Iceberg `OPTIMIZE ZORDER BY` applies before writing, expressed
  * as plain integer arithmetic + a range repartition.
  *
  * Why it matters at 100 TB: parquet row-group skipping prunes on
  * per-file min/max stats, which a single-column sort only tightens for
  * its leading column. Interleaving the bits of two (or more) key
  * columns into one Morton value and range-partitioning on it keeps
  * EVERY interleaved column's min/max narrow in every file, so
  * predicates on either column skip most row groups. The z-value is
  * pure BIGINT bit arithmetic — identical in any engine, which is what
  * makes `lay_zorder` oracle-checkable.
  */
object Layout {

  /** 2-D Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def morton2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** DuckDB twin of [[morton2]] — the same OR-of-shifted-bits form. */
  def morton2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** The layout op itself: cluster `df` into `nFiles` ranges of the
    * Morton value of (x, y) — what a writer calls right before
    * `.write.parquet`. Sorting within partitions tightens row-group
    * stats further. */
  def zorderRepartition(df: DataFrame, x: Column, y: Column,
      nFiles: Int, bits: Int = 16): DataFrame = {
    val z = df.withColumn("_z", morton2(x, y, bits))
    z.repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
