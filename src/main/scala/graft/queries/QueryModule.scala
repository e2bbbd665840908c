package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named batch of oracle-checked queries. Each entry in `queries` is a
  * pure `(session, sfDir) => DataFrame`; `oracle` carries the ANSI-SQL twin
  * the driver runs in DuckDB over the same parquet tables. Keys must match;
  * entries absent from `oracle` get a weaker rows-only check.
  *
  * Determinism contract (so the driver's hash compare is meaningful):
  *  - every query ends in a total `ORDER BY` (unique tie-break column);
  *  - money sums go through DECIMAL(18,2) and back to double (see
  *    [[graft.functions.TextFns.dsum]]) so float summation order can't
  *    change the bits;
  *  - all column names are aliased identically on both sides.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
