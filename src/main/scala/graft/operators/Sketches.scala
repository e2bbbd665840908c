package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog (Flajolet et al. 2007) with a FULL hash
  * oracle — the upgrade over `sketch_approx_distinct`, whose engine-
  * native HLL++ can only be bound-checked because DuckDB and Spark
  * implement different sketches. Here BOTH engines compute the SAME
  * sketch from the same md5-derived 56-bit hashes:
  *
  *  - bucket = h % m, v = h DIV m (the remaining 56−log₂m bits);
  *  - rho = leading zeros of v + 1 = (bitwidth+1) − length(bin(v)),
  *    exact in both engines (`bin` strips leading zeros identically);
  *  - the harmonic sum is kept in EXACT integers: Σ 2^(−M_j) scaled by
  *    2^bitwidth+1 is a BIGINT sum of powers of two — no float
  *    summation order anywhere;
  *  - the one transcendental (small-range linear counting ln(m/V)) is
  *    snapped to the 1e-6 grid, the repo's standard discipline.
  *
  * The estimate is therefore bit-identical across engines and the
  * oracle hashes it directly. Scale shape: one groupBy producing m
  * register rows per group (map-side partial max), then an m-bounded
  * rollup — the sketch property that matters at 100 TB (registers
  * merge associatively; a billion rows reduce to m longs per group). */
object Sketches {

  /** Register count (2^6) and the value bitwidth after bucketing. */
  val M = 64
  private val ValueBits = 50 // 56-bit hash minus 6 bucket bits
  private val RhoMax = ValueBits + 1 // all-zero value
  /** α₆₄·m²·2^RhoMax as ONE double constant (Flajolet's α₆₄ = 0.709),
    * emitted identically into both engines — a lone raw-estimate
    * numerator, so neither engine performs its own constant folding. */
  private val EstNumer: Double = 0.709 * M * M * math.pow(2.0, RhoMax)

  private def hash54(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** The sketch state: per-(group, bucket) max rho — the m-bounded rows
    * a 100 TB deployment persists and MERGES (register merge = MAX per
    * bucket, associative and commutative; AnalyticsSpec proves
    * merge-then-estimate == estimate-of-union). */
  def registers(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val h = hash54(concat(lit("hll:"), keyCol.cast("string")))
    // bucket/value split via BIT ops, never `/`: Column./ is DOUBLE
    // division, and a 56-bit hash exceeds the 53-bit significand.
    // NULL keys are dropped first (countDistinct semantics): a NULL key
    // hashes to a NULL bucket whose register row would inflate
    // `present` without contributing to the harmonic sum.
    df.filter(keyCol.isNotNull)
      .select(groupCol.as("grp"), keyCol.as("key"),
        h.bitwiseAND(lit(M.toLong - 1)).as("bucket"),
        shiftright(h, 6).as("v"))
      .withColumn("rho",
        when(col("v") === 0L, lit(RhoMax.toLong))
          .otherwise((lit(RhoMax) - length(bin(col("v")))).cast("long")))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
  }

  /** Merge register sets from disjoint (or overlapping) data slices:
    * per-bucket MAX. Exactly the operation a partitioned/streaming
    * deployment runs to combine per-shard sketches. */
  def mergeRegisters(regSets: Seq[DataFrame]): DataFrame =
    regSets.reduce(_ unionByName _)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("m_j")).as("m_j"))

  /** Estimate per group from a register set — (grp, s, v_empty,
    * estimate). */
  def estimateFromRegisters(regs: DataFrame): DataFrame = {
    val sums = regs.groupBy(col("grp"))
      .agg(sum(expr(
          s"shiftleft(CAST(1 AS BIGINT), CAST($RhoMax - m_j AS INT))"))
          .as("s_present"),
        count(lit(1)).as("present"))
      .select(col("grp"),
        (col("s_present") +
          (lit(M.toLong) - col("present")) * lit(1L << RhoMax)).as("s"),
        (lit(M.toLong) - col("present")).as("v_empty"))
    sums
      .withColumn("e_raw", lit(EstNumer) / col("s").cast("double"))
      .withColumn("estimate",
        when(col("v_empty") > 0L && col("e_raw") <= lit(2.5 * M),
          lit(M.toDouble) *
            (floor(log(lit(M.toDouble) / col("v_empty").cast("double"))
              * lit(1e6) + lit(0.5)).cast("long").cast("double") / lit(1e6)))
          .otherwise(col("e_raw")))
      .select(col("grp"), col("s"), col("v_empty"), col("estimate"))
  }

  /** Distinct-count estimate per `groupCol` over `keyCol`, alongside the
    * exact count (the oracle checks BOTH — the estimate for determinism,
    * the pair for the sketch being a real estimator). Composition of
    * [[registers]] → [[estimateFromRegisters]]. */
  def hllDistinct(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val est = estimateFromRegisters(registers(df, groupCol, keyCol))
    val exact = df.groupBy(groupCol.as("grp"))
      .agg(countDistinct(keyCol).as("exact_keys"),
        count(lit(1)).as("n_rows"))
    est.join(exact, Seq("grp"))
      .select(col("grp"), col("exact_keys"), col("n_rows"), col("s"),
        col("v_empty"), col("estimate"))
  }

  /** DuckDB twin of [[hllDistinct]] over `table` — same hash, same
    * integer registers, same snap. `groupCol`/`keyCol` are column
    * names. */
  def hllDistinctSql(table: String, groupCol: String, keyCol: String): String =
    s"""WITH hh AS (SELECT $groupCol AS grp, $keyCol AS key,
       |              CAST(('0x' || substr(md5('hll:' || CAST($keyCol AS VARCHAR)), 1, 14)) AS BIGINT) AS h
       |            FROM $table WHERE $keyCol IS NOT NULL),
       |hr AS (SELECT grp, h & ${M - 1} AS bucket, h >> 6 AS v FROM hh),
       |hrho AS (SELECT grp, bucket,
       |           CASE WHEN v = 0 THEN $RhoMax
       |                ELSE $RhoMax - length(bin(v)) END AS rho
       |         FROM hr),
       |regs AS (SELECT grp, bucket, MAX(rho) AS m_j
       |         FROM hrho GROUP BY grp, bucket),
       |sums AS (SELECT grp,
       |           CAST(SUM(CAST(1 AS BIGINT) << CAST($RhoMax - m_j AS INT)) AS BIGINT)
       |             + ($M - COUNT(*)) * (CAST(1 AS BIGINT) << $RhoMax) AS s,
       |           $M - COUNT(*) AS v_empty
       |         FROM regs GROUP BY grp),
       |ex AS (SELECT $groupCol AS grp, COUNT(DISTINCT $keyCol) AS exact_keys,
       |              COUNT(*) AS n_rows
       |       FROM $table GROUP BY $groupCol)
       |SELECT s.grp, ex.exact_keys, ex.n_rows, s.s, s.v_empty,
       |       CASE WHEN s.v_empty > 0
       |              AND $EstNumer / CAST(s.s AS DOUBLE) <= ${2.5 * M}
       |            THEN ${M.toDouble} *
       |              (CAST(CAST(FLOOR(ln(${M.toDouble} / CAST(s.v_empty AS DOUBLE))
       |                 * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0)
       |            ELSE $EstNumer / CAST(s.s AS DOUBLE)
       |       END AS estimate
       |FROM sums s JOIN ex ON ex.grp = s.grp""".stripMargin
}
