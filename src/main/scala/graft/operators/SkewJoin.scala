package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the manual complement to AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin`, on by default in [[graft.Sessions]]).
  *
  * Salting splits each hot key into `nSalts` sub-keys: the skewed (big)
  * side gets a deterministic salt derived from a high-cardinality column,
  * the build side is replicated once per salt. Join results are identical
  * to the unsalted join — only the partitioning changes — so the DuckDB
  * oracle for a salted query is simply the plain join.
  *
  * Use AQE first; reach for explicit salting when (a) a single key
  * exceeds what one task can hold even after AQE splitting, or (b) the
  * aggregation itself skews (salt → partial agg → final agg).
  */
object SkewJoin {

  /** Deterministic salt in [0, nSalts) from a row-identifying column
    * (NOT rand(): retries and the oracle must see the same salt). */
  def salt(idCol: Column, nSalts: Int): Column =
    pmod(hash(idCol), lit(nSalts))

  /** Equi-join `big ⋈ small` on `key`, with the big side salted by
    * `bigIdCol` and the small side exploded `nSalts`-fold. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigIdCol: Column, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(bigIdCol, nSalts))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-safe aggregation: two-phase groupBy with a salt in the first
    * phase so one hot group fans out over `nSalts` partial aggregates.
    * `partial` must be decomposable (sum/count/min/max style). */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
      idCol: Column, nSalts: Int): DataFrame =
    df.withColumn("_salt", salt(idCol, nSalts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("total"))
}
