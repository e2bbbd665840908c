package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // ------------------------------------------------------------------
  // Count–min sketch (Cormode & Muthukrishnan, "An improved data stream
  // summary: the count-min sketch and its applications", J. Algorithms
  // 2005). Same register discipline as the HLL above: deterministic
  // md5-derived hashing, exact-integer cells, and a mergeable
  // registers → merge → estimate triple. Register rows are
  // (grp, r, c, cnt) — d·w bounded per group — and MERGE BY SUM, which
  // is associative and commutative, so per-shard sketches from a 100 TB
  // scan roll up exactly (CM merge-then-estimate == estimate-of-union,
  // cell for cell — stronger than HLL's, whose registers merge by max;
  // AnalyticsSpec proves the equality). Point estimate = min over the
  // d cells, an upper bound on the true count (one-sided error ≤
  // 2n/w with probability 1 − 2^−d).
  // ------------------------------------------------------------------

  /** Hash rows d and row width w (w a power of two so the bucket is a
    * bit-mask, never a modulo over doubles). */
  val CmDepth = 4
  val CmWidth = 256

  private def cmBucket(r: Column, key: Column): Column =
    hash54(concat(lit("cm"), r.cast("string"), lit(":"), key))
      .bitwiseAND(lit(CmWidth.toLong - 1))

  /** CM register rows (grp, r, c, cnt): each input key increments one
    * cell per hash row. NULL keys are dropped (the count of NULL is not
    * a frequency query either engine answers). */
  def cmRegisters(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame =
    df.filter(keyCol.isNotNull)
      .select(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .withColumn("r", explode(lit((0 until CmDepth).toArray)))
      .select(col("grp"), col("r").cast("long").as("r"),
        cmBucket(col("r"), col("key")).as("c"))
      .groupBy(col("grp"), col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge register sets from data slices: per-cell SUM — the exact
    * counterpart of [[mergeRegisters]]' per-bucket max. */
  def cmMerge(regSets: Seq[DataFrame]): DataFrame =
    regSets.reduce(_ unionByName _)
      .groupBy(col("grp"), col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `probes(grp, key)`: min over the d
    * cells each probe key hashes to. A missing cell means no key of the
    * group hashed there — count 0. */
  def cmEstimate(regs: DataFrame, probes: DataFrame): DataFrame =
    probes
      .withColumn("r", explode(lit((0 until CmDepth).toArray)))
      .select(col("grp"), col("key"), col("r").cast("long").as("r"),
        cmBucket(col("r").cast("long"), col("key")).as("c"))
      .join(regs, Seq("grp", "r", "c"), "left")
      .groupBy(col("grp"), col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))

  /** Frequency estimate + exact count for a deterministic probe set:
    * every key with `key % probeMod == 0`, so the oracle hashes the
    * estimates themselves (same md5 cells in both engines). */
  def cmFrequency(df: DataFrame, groupCol: Column, keyCol: Column,
      probeMod: Long): DataFrame = {
    val regs = cmRegisters(df, groupCol, keyCol)
    val probes = df.filter(keyCol.isNotNull && keyCol % probeMod === 0)
      .select(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .distinct()
    val exact = df.filter(keyCol.isNotNull)
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(count(lit(1)).as("exact_cnt"))
    cmEstimate(regs, probes)
      .join(exact, Seq("grp", "key"))
      .select(col("grp"), col("key"), col("exact_cnt"), col("cm_estimate"))
  }

  /** DuckDB twin of [[cmFrequency]] — same hashes, same cells. */
  def cmFrequencySql(table: String, groupCol: String, keyCol: String,
      probeMod: Long): String =
    s"""WITH cmk AS (SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key
       |             FROM $table WHERE $keyCol IS NOT NULL),
       |cmr AS (SELECT grp, t.r,
       |          CAST(('0x' || substr(md5('cm' || CAST(t.r AS VARCHAR) || ':' || key), 1, 14)) AS BIGINT)
       |            & ${CmWidth - 1} AS c
       |        FROM cmk, (SELECT UNNEST(range(${CmDepth})) AS r) t),
       |cmregs AS (SELECT grp, r, c, COUNT(*) AS cnt FROM cmr GROUP BY grp, r, c),
       |cmprobe AS (SELECT DISTINCT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key
       |            FROM $table WHERE $keyCol IS NOT NULL AND $keyCol % $probeMod = 0),
       |cmpc AS (SELECT p.grp, p.key, t.r,
       |           CAST(('0x' || substr(md5('cm' || CAST(t.r AS VARCHAR) || ':' || p.key), 1, 14)) AS BIGINT)
       |             & ${CmWidth - 1} AS c
       |         FROM cmprobe p, (SELECT UNNEST(range(${CmDepth})) AS r) t),
       |cmest AS (SELECT pc.grp, pc.key,
       |            MIN(COALESCE(g.cnt, 0)) AS cm_estimate
       |          FROM cmpc pc LEFT JOIN cmregs g
       |            ON g.grp = pc.grp AND g.r = pc.r AND g.c = pc.c
       |          GROUP BY pc.grp, pc.key),
       |cmexact AS (SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key,
       |              COUNT(*) AS exact_cnt
       |            FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1, 2)
       |SELECT e.grp, e.key, x.exact_cnt, e.cm_estimate
       |FROM cmest e JOIN cmexact x ON x.grp = e.grp AND x.key = e.key""".stripMargin

  // ------------------------------------------------------------------
  // KMV — k-minimum-values sketch (Bar-Yossef et al., RANDOM 2002;
  // Beyer et al., "On synopses for distinct-value estimation under
  // multiset operations", SIGMOD 2007). Registers = the k smallest
  // DISTINCT md5 hashes per group: a bounded, ORDER-FREE summary whose
  // merge (k smallest of the union) is an exact semilattice operation —
  // merge-then-estimate == estimate-of-union bit for bit, like the HLL's
  // max. What it adds over the HLL is SET OPERATIONS: the k minima of
  // A ∪ B are a uniform sample of A ∪ B, so |{h ∈ minima(A∪B) : h ∈ A
  // ∧ h ∈ B}| / k estimates Jaccard(A, B) (Broder's minwise argument) —
  // the sketch a dedup pipeline uses to compare corpus slices without a
  // rescan. Distinct estimate: exact |regs| while |regs| < k, else
  // (k−1)·2^56 / h_k — one IEEE division of exact integers, identical
  // in both engines.
  // ------------------------------------------------------------------

  /** Register budget. (k−1)·2^56 = 63·2^56 — exactly representable in a
    * double (6-bit mantissa), emitted as ONE literal into both engines
    * like [[EstNumer]]. */
  val KmvK = 64
  private val KmvNumer: Double = (KmvK - 1).toDouble * math.pow(2.0, 56)

  /** The sketch state: the k smallest distinct hashes per group. */
  def kmvRegisters(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val h = hash54(concat(lit("kmv:"), keyCol.cast("string")))
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    df.filter(keyCol.isNotNull)
      .select(groupCol.as("grp"), h.as("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .select(col("grp"), col("h"))
  }

  /** Merge register sets: k smallest distinct hashes of the union —
    * associative, commutative, idempotent (a semilattice), so shard
    * sketches roll up exactly. */
  def kmvMerge(regSets: Seq[DataFrame]): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    regSets.reduce(_ unionByName _).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .select(col("grp"), col("h"))
  }

  /** Distinct estimate per group: exact register count while the sketch
    * is unsaturated, else (k−1)·2^56 / h_k. */
  def kmvEstimateDistinct(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("regs"), max(col("h")).as("kth_hash"))
      .select(col("grp"), col("regs"), col("kth_hash"),
        when(col("regs") < KmvK, col("regs").cast("double"))
          .otherwise(lit(KmvNumer) / col("kth_hash").cast("double"))
          .as("estimate"))

  /** Distinct estimate beside the exact count (the oracle checks both). */
  def kmvDistinct(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val est = kmvEstimateDistinct(kmvRegisters(df, groupCol, keyCol))
    val exact = df.filter(keyCol.isNotNull).groupBy(groupCol.as("grp"))
      .agg(countDistinct(keyCol).as("exact_keys"))
    est.join(exact, Seq("grp"))
      .select(col("grp"), col("exact_keys"), col("regs"), col("kth_hash"),
        col("estimate"))
  }

  /** Pairwise Jaccard estimates BETWEEN groups, from registers alone:
    * for each unordered group pair, take the k smallest hashes of the
    * two register sets' union and count how many live in both — that
    * count over k estimates J. Output (ga, gb, kmin, matches, j_est)
    * with the exact Jaccard joined in by [[kmvJaccard]]. */
  def kmvJaccardFromRegisters(regs: DataFrame): DataFrame = {
    val groups = regs.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("ga"))
      .crossJoin(groups.select(col("grp").as("gb")))
      .filter(col("ga") < col("gb"))
    val ra = regs.select(col("grp").as("ga"), col("h"))
    val rb = regs.select(col("grp").as("gb"), col("h"))
    // hashes present in either side's register set, per pair
    val u = pairs.join(ra, Seq("ga")).select(col("ga"), col("gb"), col("h"))
      .unionByName(pairs.join(rb, Seq("gb"))
        .select(col("ga"), col("gb"), col("h")))
      .distinct()
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val kmin = u.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
    val flagged = kmin
      .join(ra.withColumn("in_a", lit(1L)), Seq("ga", "h"), "left")
      .join(rb.withColumn("in_b", lit(1L)), Seq("gb", "h"), "left")
    flagged.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("kmin"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("matches"))
      .select(col("ga"), col("gb"), col("kmin"), col("matches"),
        (col("matches").cast("double") / col("kmin").cast("double"))
          .as("j_est"))
  }

  /** End-to-end pairwise Jaccard: sketch estimate beside the exact
    * intersection/union counts — all integers plus two lone IEEE
    * divisions, so the oracle hashes everything. */
  def kmvJaccard(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val est = kmvJaccardFromRegisters(kmvRegisters(df, groupCol, keyCol))
    val sets = df.filter(keyCol.isNotNull)
      .select(groupCol.as("grp"), keyCol.as("key")).distinct()
    val sa = sets.select(col("grp").as("ga"), col("key"))
    val sb = sets.select(col("grp").as("gb"), col("key"))
    val inter = sa.join(sb, Seq("key")).filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("inter_exact"))
    val sizes = sets.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    est.join(inter, Seq("ga", "gb"), "left")
      .join(sizes.select(col("grp").as("ga"), col("n").as("na")), Seq("ga"))
      .join(sizes.select(col("grp").as("gb"), col("n").as("nb")), Seq("gb"))
      .select(col("ga"), col("gb"), col("kmin"), col("matches"),
        col("j_est"),
        coalesce(col("inter_exact"), lit(0L)).as("inter_exact"),
        (col("na") + col("nb") - coalesce(col("inter_exact"), lit(0L)))
          .as("union_exact"))
      .withColumn("j_exact",
        col("inter_exact").cast("double") / col("union_exact").cast("double"))
  }

  /** DuckDB twin of [[kmvDistinct]]. */
  def kmvDistinctSql(table: String, groupCol: String, keyCol: String): String =
    s"""WITH kh AS (SELECT DISTINCT $groupCol AS grp,
       |    CAST(('0x' || substr(md5('kmv:' || CAST($keyCol AS VARCHAR)), 1, 14)) AS BIGINT) AS h
       |  FROM $table WHERE $keyCol IS NOT NULL),
       |kregs AS (SELECT grp, h FROM (
       |    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM kh) WHERE rn <= $KmvK),
       |kest AS (SELECT grp, COUNT(*) AS regs, MAX(h) AS kth_hash FROM kregs GROUP BY grp),
       |kex AS (SELECT $groupCol AS grp, COUNT(DISTINCT $keyCol) AS exact_keys
       |  FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1)
       |SELECT e.grp, x.exact_keys, e.regs, e.kth_hash,
       |  CASE WHEN e.regs < $KmvK THEN CAST(e.regs AS DOUBLE)
       |       ELSE $KmvNumer / CAST(e.kth_hash AS DOUBLE) END AS estimate
       |FROM kest e JOIN kex x ON x.grp = e.grp""".stripMargin

  /** DuckDB twin of [[kmvJaccard]]. */
  def kmvJaccardSql(table: String, groupCol: String, keyCol: String): String =
    s"""WITH kh AS (SELECT DISTINCT $groupCol AS grp,
       |    CAST(('0x' || substr(md5('kmv:' || CAST($keyCol AS VARCHAR)), 1, 14)) AS BIGINT) AS h
       |  FROM $table WHERE $keyCol IS NOT NULL),
       |kregs AS (SELECT grp, h FROM (
       |    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM kh) WHERE rn <= $KmvK),
       |kp AS (SELECT a.grp AS ga, b.grp AS gb
       |  FROM (SELECT DISTINCT grp FROM kregs) a,
       |       (SELECT DISTINCT grp FROM kregs) b WHERE a.grp < b.grp),
       |ku AS (SELECT DISTINCT ga, gb, h FROM (
       |    SELECT p.ga, p.gb, r.h FROM kp p JOIN kregs r ON r.grp = p.ga
       |    UNION ALL SELECT p.ga, p.gb, r.h FROM kp p JOIN kregs r ON r.grp = p.gb)),
       |kmin AS (SELECT ga, gb, h FROM (
       |    SELECT ga, gb, h, ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
       |    FROM ku) WHERE rn <= $KmvK),
       |kj AS (SELECT m.ga, m.gb, COUNT(*) AS kmin,
       |    CAST(SUM(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS matches
       |  FROM kmin m
       |  LEFT JOIN kregs ia ON ia.grp = m.ga AND ia.h = m.h
       |  LEFT JOIN kregs ib ON ib.grp = m.gb AND ib.h = m.h
       |  GROUP BY m.ga, m.gb),
       |ksets AS (SELECT DISTINCT $groupCol AS grp, $keyCol AS key
       |  FROM $table WHERE $keyCol IS NOT NULL),
       |kin AS (SELECT a.grp AS ga, b.grp AS gb, COUNT(*) AS inter_exact
       |  FROM ksets a JOIN ksets b ON b.key = a.key AND a.grp < b.grp
       |  GROUP BY a.grp, b.grp),
       |ksz AS (SELECT grp, COUNT(*) AS n FROM ksets GROUP BY grp)
       |SELECT j.ga, j.gb, j.kmin, j.matches,
       |  CAST(j.matches AS DOUBLE) / CAST(j.kmin AS DOUBLE) AS j_est,
       |  COALESCE(i.inter_exact, 0) AS inter_exact,
       |  sa.n + sb.n - COALESCE(i.inter_exact, 0) AS union_exact,
       |  CAST(COALESCE(i.inter_exact, 0) AS DOUBLE)
       |    / CAST(sa.n + sb.n - COALESCE(i.inter_exact, 0) AS DOUBLE) AS j_exact
       |FROM kj j LEFT JOIN kin i ON i.ga = j.ga AND i.gb = j.gb
       |     JOIN ksz sa ON sa.grp = j.ga JOIN ksz sb ON sb.grp = j.gb""".stripMargin

  // ------------------------------------------------------------------
  // Q-digest (Shrivastava, Buragohain, Agrawal & Suri, "Medians and
  // beyond: new aggregation techniques for sensor networks", SenSys
  // 2004) — the deterministic MERGEABLE quantile sketch. Values live in
  // the integer domain [0, 2^QdL); the digest is a set of binary-tree
  // nodes (grp, lvl, id, cnt) where node (lvl, id) covers values
  // [id·2^lvl, (id+1)·2^lvl). Build compresses bottom-up: a sibling
  // family whose total ≤ n/k collapses into its parent, so heavy values
  // keep exact leaf counts while sparse regions aggregate — ≤ 3k nodes,
  // rank error ≤ (QdL/k)·n. Everything is integer groupBy/join — no
  // floats — so the node set, and hence every quantile answer, is
  // bit-identical cross-engine. MERGE = per-node count SUM + one
  // recompress under the combined threshold (counts sum associatively;
  // unlike the CM sketch the recompressed node SET need not equal the
  // built-from-union one, so the merge contract is the published rank
  // bound, which AnalyticsSpec asserts).
  // ------------------------------------------------------------------

  /** Domain bits (values clamped to [0, 2^QdL)) and compression factor
    * k (threshold = max(1, n DIV k)). */
  val QdL = 17
  val QdK = 64

  import graft.plans.Pins.PinnedOps

  /** Per-group value counts clamped to the domain — the level-0 leaves
    * (grp, id, cnt). `valueCol` must already be integral; clamp keeps
    * out-of-domain values at the edges rather than dropping mass. */
  def qdLeaves(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    df.filter(valueCol.isNotNull)
      .select(groupCol.as("grp"),
        least(greatest(valueCol.cast("long"), lit(0L)),
          lit((1L << QdL) - 1)).as("id"))
      .groupBy(col("grp"), col("id"))
      .agg(count(lit(1)).as("cnt"))

  /** Bottom-up q-digest compression of `nodes(grp, lvl, id, cnt)` under
    * per-group totals `tot(grp, n)`. Level l collapses sibling families
    * at level l (absorbing any pre-existing parent count, which the
    * MERGE path produces) when the family total ≤ max(1, n DIV k);
    * uncollapsed rows settle.
    *
    * r17 (optimization-guide §1.2/§2.4 — fix the distributed algorithm
    * first): the compression is strictly GROUP-LOCAL and its working set
    * is bounded by the clamped DOMAIN (≤ 2^QdL level-0 slots plus the
    * merge path's ≤ QdL-level parents), never by input volume — the
    * level-0 aggregation upstream already reduced the data. The r11 form
    * ran the collapse as QdL=17 distributed rounds (each one shuffle +
    * 2 localCheckpoint pins: ~34 jobs of sub-second work — pure
    * per-round scheduling latency at any scale, since the frames never
    * exceed 2^QdL rows per group). It is now ONE narrow exchange of the
    * pre-aggregated nodes keyed by grp followed by the exact same
    * bottom-up collapse run in-memory per group (BIGINT additions in a
    * deterministic per-family order — identical arithmetic, identical
    * output rows; sketch_qdigest hash-checked against the unchanged
    * DuckDB twin, merge==build-on-union spec unchanged). Measured at
    * sf0.1: sketch_qdigest 7.2 s → see BASELINE.md r17. `leavesOnly`
    * is kept for API stability; the single-pass collapse reads the
    * parent levels it needs directly, so the flag no longer changes the
    * plan. */
  def qdCompress(nodes: DataFrame, tot: DataFrame,
      leavesOnly: Boolean = false): DataFrame = {
    val spark = nodes.sparkSession
    // INTEGER division (`div`), matching the twin's `//` (the r11 note:
    // Column./ is DOUBLE division and only agrees while QdK is a power
    // of two).
    val in = nodes
      .select(col("grp"), col("lvl").cast("int").as("lvl"),
        col("id").cast("long").as("id"), col("cnt").cast("long").as("cnt"))
      .join(tot.select(col("grp"),
        greatest(expr(s"n div ${QdK}L"), lit(1L)).as("t")), Seq("grp"))
    val grpField = in.schema("grp")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      grpField,
      org.apache.spark.sql.types.StructField("lvl",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType)))
    // Explicit partition COUNT (the Multimodal.fannedIds lesson): the
    // pre-aggregated node rows are small, and AQE would coalesce a bare
    // repartition(col) back toward one partition; group-count, not byte
    // count, is the parallelism that matters here.
    val packed = in
      .repartition(spark.sessionState.conf.numShufflePartitions, col("grp"))
      .sortWithinPartitions("grp")
    packed.mapPartitions { it =>
      val rows = it.buffered
      new Iterator[org.apache.spark.sql.Row] {
        private var out: Iterator[org.apache.spark.sql.Row] = Iterator.empty
        override def hasNext: Boolean = out.hasNext || rows.hasNext
        override def next(): org.apache.spark.sql.Row = {
          if (!out.hasNext) out = compressGroup(rows)
          out.next()
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Drain ONE group's rows from `rows` (grp-contiguous after the
    * sortWithinPartitions above) and run the bottom-up collapse —
    * the exact per-round semantics of the r11 distributed loop. */
  private def compressGroup(
      rows: scala.collection.BufferedIterator[org.apache.spark.sql.Row])
      : Iterator[org.apache.spark.sql.Row] = {
    import scala.collection.mutable
    val grp = rows.head.get(0)
    var t = 1L
    // active level-0 entries stay INDIVIDUAL rows (the loop settled the
    // original child rows, not a re-aggregation of them); higher-level
    // parent rows are per-(lvl,id) counts (both paths pre-aggregate)
    var active = mutable.ArrayBuffer.empty[(Long, Long)]
    val parents = mutable.HashMap.empty[Int, mutable.HashMap[Long, Long]]
    while (rows.hasNext && rows.head.get(0) == grp) {
      val r = rows.next()
      val (lvl, id, cnt) = (r.getInt(1), r.getLong(2), r.getLong(3))
      t = r.getLong(4)
      if (lvl == 0) active += ((id, cnt))
      else {
        val m = parents.getOrElseUpdate(lvl, mutable.HashMap.empty)
        m.update(id, m.getOrElse(id, 0L) + cnt)
      }
    }
    val out = mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    for (l <- 0 until QdL) {
      // families at this level: pid -> (children, child sum)
      val fam = mutable.LinkedHashMap
        .empty[Long, mutable.ArrayBuffer[(Long, Long)]]
      active.foreach { e =>
        fam.getOrElseUpdate(e._1 >> 1, mutable.ArrayBuffer.empty) += e
      }
      val pmap = parents.getOrElse(l + 1, mutable.HashMap.empty)
      val next = mutable.ArrayBuffer.empty[(Long, Long)]
      val pids = (fam.keysIterator ++ pmap.keysIterator)
        .to(mutable.LinkedHashSet)
      pids.foreach { pid =>
        val children = fam.getOrElse(pid, mutable.ArrayBuffer.empty)
        var csum = 0L
        children.foreach(csum += _._2)
        val pcnt = pmap.get(pid)
        val fsum = csum + pcnt.getOrElse(0L)
        if (fsum > t) {
          // uncollapsed: children settle at level l; a pre-existing
          // parent row stays active at l+1 unchanged
          children.foreach { case (id, cnt) =>
            out += org.apache.spark.sql.Row(grp, l, id, cnt)
          }
          pcnt.foreach(pc => next += ((pid, pc)))
        } else next += ((pid, fsum)) // collapsed, absorbed total moves up
      }
      active = next
    }
    active.foreach { case (id, cnt) =>
      out += org.apache.spark.sql.Row(grp, QdL, id, cnt)
    }
    out.iterator
  }

  /** Build a compressed digest + its totals for shard/streaming use —
    * the (digest, tot) pair [[qdMerge]] combines. Same clamp and
    * leaves-only fast path as [[qdigestQuantiles]], without the
    * quantile answering. */
  def qdBuild(df: DataFrame, groupCol: Column,
      valueCol: Column): (DataFrame, DataFrame) = {
    // ADVICE r12: the null-filter/clamp/count lives in qdLeaves ONLY —
    // re-deriving totals from the (already tiny) leaf counts keeps the
    // streaming build path from silently diverging if the clamp or
    // domain ever changes there.
    val l0 = qdLeaves(df, groupCol, valueCol)
    val tot = l0.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val leaves = l0.select(col("grp"), lit(0).cast("int").as("lvl"),
      col("id"), col("cnt"))
    (qdCompress(leaves, tot, leavesOnly = true), tot)
  }

  /** Merge digests: per-node count SUM, then one recompress under the
    * combined totals. `tots` must be the same slices' (grp, n) frames. */
  def qdMerge(digests: Seq[DataFrame], tots: Seq[DataFrame]): DataFrame = {
    val nodes = digests.reduce(_ unionByName _)
      .groupBy(col("grp"), col("lvl"), col("id"))
      .agg(sum(col("cnt")).as("cnt"))
    val tot = tots.reduce(_ unionByName _)
      .groupBy(col("grp")).agg(sum(col("n")).as("n"))
    qdCompress(nodes, tot)
  }

  /** φ-quantile estimates from a digest: nodes ordered by (right
    * endpoint, level), running count; the φ answer is the first right
    * endpoint whose running count reaches rank ⌈φ·n⌉. φ is the exact
    * rational num/den so the rank is an integer both engines compute
    * identically. Output (grp, q, est). */
  def qdQuantiles(digest: DataFrame, tot: DataFrame,
      qs: Seq[(Int, Int)]): DataFrame = {
    val rend = digest.select(col("grp"), col("lvl"), col("cnt"),
      expr(s"(id + 1) * shiftleft(CAST(1 AS BIGINT), lvl) - 1").as("rend"))
    val w = Window.partitionBy(col("grp")).orderBy(col("rend"), col("lvl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = rend.withColumn("cum", sum(col("cnt")).over(w)).pinned
    qs.map { case (num, den) =>
      val rank = tot.select(col("grp"),
        expr(s"CAST((n * $num + ${den - 1}) DIV $den AS BIGINT)").as("rank"))
      cum.join(rank, Seq("grp"))
        .filter(col("cum") >= col("rank"))
        .groupBy(col("grp"))
        .agg(min(col("rend")).as("est"))
        .select(col("grp"), lit(s"$num/$den").as("q"), col("est"))
    }.reduce(_ unionByName _)
  }

  /** End-to-end: build the digest over `valueCol` (clamped integral) per
    * `groupCol`, answer `qs`, and pair each estimate with the EXACT
    * rank-r value and the digest's node count — (grp, q, rank, est,
    * exact_disc, digest_nodes), all integers, hash-identical
    * cross-engine ([[qdigestQuantilesSql]]). */
  def qdigestQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
      qs: Seq[(Int, Int)]): DataFrame = {
    val vals = df.filter(valueCol.isNotNull)
      .select(groupCol.as("grp"),
        least(greatest(valueCol.cast("long"), lit(0L)),
          lit((1L << QdL) - 1)).as("v"))
    val tot = vals.groupBy(col("grp")).agg(count(lit(1)).as("n")).pinned
    val leaves = vals.groupBy(col("grp"), col("v").as("id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("grp"), lit(0).cast("int").as("lvl"), col("id"), col("cnt"))
    val digest = qdCompress(leaves, tot, leavesOnly = true).pinned
    val nNodes = digest.groupBy(col("grp"))
      .agg(count(lit(1)).as("digest_nodes"))
    val est = qdQuantiles(digest, tot, qs)
    val wv = Window.partitionBy(col("grp")).orderBy(col("v"))
    val sorted = vals.withColumn("rn", row_number().over(wv))
    // ONE window pass for all φ targets (r17): the per-q legs each
    // re-derived `sorted` — a full per-group sort of the value rows —
    // three times; joining against a q-labelled rank table keeps the
    // identical (grp, q, rank, exact_disc) rows from a single sort.
    val rankTab = qs.map { case (num, den) =>
      tot.select(col("grp").as("r_grp"), lit(s"$num/$den").as("q"),
        expr(s"CAST((n * $num + ${den - 1}) DIV $den AS BIGINT)").as("rank"))
    }.reduce(_ unionByName _)
    val exact = sorted.join(rankTab,
        sorted("grp") === col("r_grp") && col("rn") === col("rank"))
      .select(col("grp"), col("q"), col("rank"), col("v").as("exact_disc"))
    est.join(exact, Seq("grp", "q"))
      .join(nNodes, Seq("grp"))
      .select(col("grp"), col("q"), col("rank"), col("est"),
        col("exact_disc"), col("digest_nodes"))
  }

  /** DuckDB twin of [[qdigestQuantiles]]: the same clamp, the QdL
    * unrolled compression rounds (no pre-existing parents on the build
    * path, so each round is one GROUP BY + threshold split), the same
    * (rend, lvl) running-count rank pick. `valueExpr` must be an
    * integral SQL expression. */
  def qdigestQuantilesSql(table: String, groupCol: String, valueExpr: String,
      qs: Seq[(Int, Int)]): String = {
    val top = (1L << QdL) - 1
    val init =
      s"""qd_src AS MATERIALIZED (SELECT $groupCol AS grp,
         |    LEAST(GREATEST($valueExpr, 0), $top) AS v
         |  FROM $table WHERE $valueExpr IS NOT NULL),
         |qd_tot AS MATERIALIZED (SELECT grp, COUNT(*) AS n FROM qd_src GROUP BY grp),
         |qd_th AS MATERIALIZED (SELECT grp, GREATEST(n // $QdK, 1) AS t FROM qd_tot),
         |qa0 AS MATERIALIZED (SELECT grp, v AS id, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM qd_src GROUP BY grp, v)""".stripMargin
    val rounds = (0 until QdL).map { l =>
      s"""qf$l AS (SELECT grp, id >> 1 AS pid, CAST(SUM(cnt) AS BIGINT) AS fsum
         |  FROM qa$l GROUP BY grp, id >> 1),
         |qs$l AS (SELECT a.grp, $l AS lvl, a.id, a.cnt
         |  FROM qa$l a JOIN qf$l f ON f.grp = a.grp AND f.pid = (a.id >> 1)
         |       JOIN qd_th th ON th.grp = a.grp
         |  WHERE f.fsum > th.t),
         |qa${l + 1} AS MATERIALIZED (SELECT f.grp, f.pid AS id, f.fsum AS cnt
         |  FROM qf$l f JOIN qd_th th ON th.grp = f.grp WHERE f.fsum <= th.t)""".stripMargin
    }
    val unionNodes = ((0 until QdL)
      .map(l => s"SELECT grp, lvl, id, cnt FROM qs$l") :+
      s"SELECT grp, $QdL AS lvl, id, cnt FROM qa$QdL").mkString("\n  UNION ALL ")
    val estLegs = qs.map { case (num, den) =>
      s"""SELECT c.grp, '$num/$den' AS q,
         |    CAST((t.n * $num + ${den - 1}) // $den AS BIGINT) AS rank,
         |    MIN(c.rend) AS est
         |  FROM qcum c JOIN qd_tot t ON t.grp = c.grp
         |  WHERE c.cum >= (t.n * $num + ${den - 1}) // $den
         |  GROUP BY c.grp, t.n""".stripMargin
    }.mkString("\n  UNION ALL ")
    val exactLegs = qs.map { case (num, den) =>
      s"""SELECT s.grp, '$num/$den' AS q, s.v AS exact_disc
         |  FROM qd_sorted s JOIN qd_tot t ON t.grp = s.grp
         |  WHERE s.rn = (t.n * $num + ${den - 1}) // $den""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH $init,
       |${rounds.mkString(",\n")},
       |qnodes AS MATERIALIZED (
       |  ${unionNodes}),
       |qcum AS (SELECT grp, lvl, cnt,
       |    (id + 1) * (CAST(1 AS BIGINT) << lvl) - 1 AS rend,
       |    SUM(cnt) OVER (PARTITION BY grp
       |      ORDER BY (id + 1) * (CAST(1 AS BIGINT) << lvl) - 1, lvl
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM qnodes),
       |qd_sorted AS (SELECT grp, v,
       |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn
       |  FROM qd_src),
       |qnn AS (SELECT grp, COUNT(*) AS digest_nodes FROM qnodes GROUP BY grp),
       |qest AS ($estLegs),
       |qexact AS ($exactLegs)
       |SELECT e.grp, e.q, e.rank, e.est, x.exact_disc, nn.digest_nodes
       |FROM qest e JOIN qexact x ON x.grp = e.grp AND x.q = e.q
       |     JOIN qnn nn ON nn.grp = e.grp""".stripMargin
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

  // ------------------------------------------------------------------
  // Misra–Gries heavy-hitters summary (Misra & Gries, "Finding repeated
  // elements", Sci. Comput. Program. 1982; merge per Agarwal, Cormode,
  // Huang, Phillips, Wei & Yi, "Mergeable summaries", PODS 2012) — the
  // sketch that ENUMERATES the frequent keys with bounded state, where
  // the count–min can only answer point queries about keys you already
  // hold. Registers are ≤ k (grp, key, cnt) rows. This is the CANONICAL
  // batch form — order-free, so both engines compute the identical
  // summary: λ = the (k+1)-th largest frequency in the group (0 if ≤ k
  // keys) and the summary keeps cnt = f − λ for every key with f > λ
  // (at most k keys can beat the (k+1)-th largest, ties included).
  // MERGE = per-key counter SUM + one re-trim under the combined
  // (k+1)-th largest — deterministic, but like the q-digest the merged
  // register SET need not equal the built-from-union one, so the merge
  // contract is the published bound (est ∈ [f − Σnᵢ/(k+1), f]), which
  // AnalyticsSpec asserts. Any key with f > n/(k+1) is GUARANTEED
  // present: λ ≤ n/(k+1) because (k+1)·λ can't exceed the total.
  // ------------------------------------------------------------------

  /** Register budget: at most k heavy-hitter counters per group. */
  val MgK = 16

  /** One trim pass: λ = (k+1)-th largest cnt per group, keep cnt − λ
    * where cnt > λ. Used by both build (from exact per-key counts) and
    * merge (from summed counters). The row_number tie-break (key asc)
    * only orders EQUAL counts — λ is the (k+1)-th largest VALUE, so the
    * output is tie-order-independent. */
  private[graft] def mgTrim(cnts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cnt").desc, col("key").asc)
    val lam = cnts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === MgK + 1)
      .select(col("grp"), col("cnt").as("lam"))
    cnts.join(lam, Seq("grp"), "left")
      .withColumn("lam", coalesce(col("lam"), lit(0L)))
      .filter(col("cnt") > col("lam"))
      .select(col("grp"), col("key"), (col("cnt") - col("lam")).as("cnt"))
  }

  /** The summary: ≤ k counters per group from the exact shard counts —
    * one groupBy (map-side partial) + one k-bounded trim. */
  def mgSummary(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame =
    mgTrim(df.filter(keyCol.isNotNull)
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(count(lit(1)).cast("long").as("cnt")))

  /** Merge summaries from data slices: per-key counter SUM, one
    * re-trim. */
  def mgMerge(summaries: Seq[DataFrame]): DataFrame =
    mgTrim(summaries.reduce(_ unionByName _)
      .groupBy(col("grp"), col("key"))
      .agg(sum(col("cnt")).as("cnt")))

  /** Heavy hitters beside the exact counts and the guarantee witness:
    * (grp, key, exact_cnt, mg_est, n_rows, guaranteed) where
    * `guaranteed` marks keys with f > n/(k+1), which the summary can
    * never drop. All integers — the oracle hashes everything. */
  def mgHeavyHitters(df: DataFrame, groupCol: Column,
      keyCol: Column): DataFrame = {
    val summary = mgSummary(df, groupCol, keyCol)
    val exact = df.filter(keyCol.isNotNull)
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(count(lit(1)).cast("long").as("exact_cnt"))
    val tot = df.filter(keyCol.isNotNull).groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    summary.join(exact, Seq("grp", "key"))
      .join(tot, Seq("grp"))
      .select(col("grp"), col("key"), col("exact_cnt"),
        col("cnt").as("mg_est"), col("n_rows"),
        (col("exact_cnt") * lit((MgK + 1).toLong) > col("n_rows"))
          .as("guaranteed"))
  }

  /** Weighted Misra–Gries: heavy hitters by a MEASURE SUM (revenue,
    * bytes, tokens) rather than row count — the weighted-increment
    * generalization in the mergeable-summaries construction. The trim
    * and [[mgMerge]] are unchanged (counters are counters); the bounds
    * scale by the total weight W: est ∈ [s − ΣWᵢ/(k+1), s], and keys
    * with s > W/(k+1) are guaranteed present. `weightCol` must be a
    * non-negative integral expression for cross-engine exactness. */
  def mgWeightedSummary(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column): DataFrame =
    mgTrim(df.filter(keyCol.isNotNull && weightCol.isNotNull)
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(sum(weightCol.cast("long")).as("cnt")))

  /** Weighted heavy hitters beside the exact sums: (grp, key,
    * exact_sum, mg_est, w_total, guaranteed). */
  def mgWeightedHeavyHitters(df: DataFrame, groupCol: Column,
      keyCol: Column, weightCol: Column): DataFrame = {
    val base = df.filter(keyCol.isNotNull && weightCol.isNotNull)
    val summary = mgWeightedSummary(df, groupCol, keyCol, weightCol)
    val exact = base
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(sum(weightCol.cast("long")).as("exact_sum"))
    val tot = base.groupBy(groupCol.as("grp"))
      .agg(sum(weightCol.cast("long")).as("w_total"))
    summary.join(exact, Seq("grp", "key"))
      .join(tot, Seq("grp"))
      .select(col("grp"), col("key"), col("exact_sum"),
        col("cnt").as("mg_est"), col("w_total"),
        (col("exact_sum") * lit((MgK + 1).toLong) > col("w_total"))
          .as("guaranteed"))
  }

  /** DuckDB twin of [[mgWeightedHeavyHitters]]. `weightExpr` must be
    * the same integral SQL expression the Spark side computes. */
  def mgWeightedHeavyHittersSql(table: String, groupCol: String,
      keyCol: String, weightExpr: String): String =
    s"""WITH mwf AS (SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key,
       |               CAST(SUM($weightExpr) AS BIGINT) AS cnt
       |             FROM $table
       |             WHERE $keyCol IS NOT NULL AND $weightExpr IS NOT NULL
       |             GROUP BY 1, 2),
       |mwlam AS (SELECT grp, cnt AS lam FROM (
       |    SELECT grp, cnt,
       |           ROW_NUMBER() OVER (PARTITION BY grp
       |             ORDER BY cnt DESC, key ASC) AS rn
       |    FROM mwf) WHERE rn = ${MgK + 1}),
       |mws AS (SELECT f.grp, f.key, f.cnt - COALESCE(l.lam, 0) AS cnt
       |        FROM mwf f LEFT JOIN mwlam l ON l.grp = f.grp
       |        WHERE f.cnt > COALESCE(l.lam, 0)),
       |mwtot AS (SELECT $groupCol AS grp, CAST(SUM($weightExpr) AS BIGINT) AS w_total
       |          FROM $table
       |          WHERE $keyCol IS NOT NULL AND $weightExpr IS NOT NULL
       |          GROUP BY 1)
       |SELECT s.grp, s.key, f.cnt AS exact_sum, s.cnt AS mg_est,
       |       t.w_total, f.cnt * ${MgK + 1} > t.w_total AS guaranteed
       |FROM mws s JOIN mwf f ON f.grp = s.grp AND f.key = s.key
       |     JOIN mwtot t ON t.grp = s.grp""".stripMargin

  /** DuckDB twin of [[mgHeavyHitters]] — same λ, same counters. */
  def mgHeavyHittersSql(table: String, groupCol: String,
      keyCol: String): String =
    s"""WITH mgf AS (SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key,
       |               CAST(COUNT(*) AS BIGINT) AS cnt
       |             FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1, 2),
       |mglam AS (SELECT grp, cnt AS lam FROM (
       |    SELECT grp, cnt,
       |           ROW_NUMBER() OVER (PARTITION BY grp
       |             ORDER BY cnt DESC, key ASC) AS rn
       |    FROM mgf) WHERE rn = ${MgK + 1}),
       |mgs AS (SELECT f.grp, f.key, f.cnt - COALESCE(l.lam, 0) AS cnt
       |        FROM mgf f LEFT JOIN mglam l ON l.grp = f.grp
       |        WHERE f.cnt > COALESCE(l.lam, 0)),
       |mgtot AS (SELECT $groupCol AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows
       |          FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1)
       |SELECT s.grp, s.key, f.cnt AS exact_cnt, s.cnt AS mg_est,
       |       t.n_rows, f.cnt * ${MgK + 1} > t.n_rows AS guaranteed
       |FROM mgs s JOIN mgf f ON f.grp = s.grp AND f.key = s.key
       |     JOIN mgtot t ON t.grp = s.grp""".stripMargin

  // ------------------------------------------------------------------
  // Bloom filter (Bloom, "Space/time trade-offs in hash coding with
  // allowable errors", CACM 1970) — the mergeable MEMBERSHIP sketch
  // that completes the family: HLL answers distinct, CM frequency,
  // q-digest quantiles, KMV set overlap; the Bloom filter answers "is
  // this key on the other side?" without shipping the other side.
  // Registers are the SET of set bit positions (grp, b) — at most BfM
  // rows per group, the relational form of the bit array — and MERGE =
  // DISTINCT UNION (bitwise OR): idempotent, associative, commutative,
  // so merge-then-test == test-of-union EXACTLY, cell for cell, like
  // the CM sum (AnalyticsSpec asserts the set equality). No false
  // negatives by construction; FP rate ≈ (1 − e^{−kn/m})^k. Same
  // md5-derived bits in both engines, so the oracle hashes the
  // membership verdicts themselves.
  //
  // The 100 TB use is the RUNTIME SEMI-JOIN PRUNE ([[bloomSemiJoin]]):
  // the build side's key bloom — ≤ m bits regardless of build size —
  // broadcasts to the probe-side scan and drops non-joining probe rows
  // BEFORE the shuffle, generalizing J3/J11's anti/semi joins the way
  // the KMV generalized D1's dedup: the exact join still runs, but
  // over the tiny bloom-surviving slice.
  // ------------------------------------------------------------------

  /** Bits m (power of two — the bit index is a mask of the md5 hash,
    * like CmWidth) and hash-function count k. */
  val BfM = 65536
  val BfK = 4

  private def bfBit(i: Column, key: Column): Column =
    hash54(concat(lit("bf"), i.cast("string"), lit(":"), key))
      .bitwiseAND(lit(BfM.toLong - 1))

  /** The sketch state: distinct set bit positions (grp, b). Each key
    * sets k = BfK positions; map-side partial dedup makes the shuffle
    * min(k·n, m)-bounded per group. */
  def bfRegisters(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame =
    df.filter(keyCol.isNotNull)
      .select(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .withColumn("i", explode(lit((0 until BfK).toArray)))
      .select(col("grp"), bfBit(col("i").cast("long"), col("key")).as("b"))
      .distinct()

  /** Merge register sets from data slices: distinct union — the
    * relational bitwise OR. */
  def bfMerge(regSets: Seq[DataFrame]): DataFrame =
    regSets.reduce(_ unionByName _).distinct()

  /** Membership verdicts for `probes(grp, key)`: a key MIGHT be in the
    * set iff all k of its positions are set. The exploded probe bits
    * join the registers (distinct on (grp, b), so at most one hit per
    * probe row) and the verdict is hits == k. */
  def bfMightContain(regs: DataFrame, probes: DataFrame): DataFrame =
    probes
      .withColumn("i", explode(lit((0 until BfK).toArray)))
      .select(col("grp"), col("key"),
        bfBit(col("i").cast("long"), col("key")).as("b"))
      .join(regs.withColumn("hit", lit(1L)), Seq("grp", "b"), "left")
      .groupBy(col("grp"), col("key"))
      .agg((sum(coalesce(col("hit"), lit(0L))) === lit(BfK.toLong))
        .as("might_contain"))

  /** Membership verdict + exact membership for the deterministic probe
    * set `key % probeMod == 0` (drawn ACROSS groups, so keys of other
    * groups are natural non-members exercising the false-positive
    * path): (grp, key, might_contain, is_member). The oracle hashes
    * both; might_contain ≥ is_member (no false negatives) is part of
    * the hashed data. */
  def bfMembership(df: DataFrame, groupCol: Column, keyCol: Column,
      probeMod: Long): DataFrame = {
    val regs = bfRegisters(df, groupCol, keyCol)
    val keys = df.filter(keyCol.isNotNull && keyCol % probeMod === 0)
      .select(keyCol.cast("string").as("key")).distinct()
    // broadcast the bounded group dim: a plain crossJoin of two
    // unhinted frames would plan the CartesianProduct PlanGuardSpec bans
    val probes = keys.crossJoin(
      broadcast(df.select(groupCol.as("grp")).distinct()))
    val exact = df.filter(keyCol.isNotNull)
      .select(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .distinct().withColumn("m", lit(true))
    bfMightContain(regs, probes)
      .join(exact, Seq("grp", "key"), "left")
      .select(col("grp"), col("key"), col("might_contain"),
        coalesce(col("m"), lit(false)).as("is_member"))
  }

  /** DuckDB twin of [[bfMembership]] — same bits, same verdicts. */
  def bfMembershipSql(table: String, groupCol: String, keyCol: String,
      probeMod: Long): String =
    s"""WITH bfk AS (SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key
       |             FROM $table WHERE $keyCol IS NOT NULL),
       |bfr AS (SELECT DISTINCT grp,
       |          CAST(('0x' || substr(md5('bf' || CAST(t.i AS VARCHAR) || ':' || key), 1, 14)) AS BIGINT)
       |            & ${BfM - 1} AS b
       |        FROM bfk, (SELECT UNNEST(range(${BfK})) AS i) t),
       |bfprobe AS (SELECT g.grp, k.key
       |            FROM (SELECT DISTINCT CAST($keyCol AS VARCHAR) AS key
       |                  FROM $table
       |                  WHERE $keyCol IS NOT NULL AND $keyCol % $probeMod = 0) k,
       |                 (SELECT DISTINCT $groupCol AS grp FROM $table) g),
       |bfpb AS (SELECT p.grp, p.key, t.i,
       |           CAST(('0x' || substr(md5('bf' || CAST(t.i AS VARCHAR) || ':' || p.key), 1, 14)) AS BIGINT)
       |             & ${BfM - 1} AS b
       |         FROM bfprobe p, (SELECT UNNEST(range(${BfK})) AS i) t),
       |bfmc AS (SELECT pb.grp, pb.key,
       |           SUM(CASE WHEN r.b IS NOT NULL THEN 1 ELSE 0 END) = ${BfK}
       |             AS might_contain
       |         FROM bfpb pb LEFT JOIN bfr r
       |           ON r.grp = pb.grp AND r.b = pb.b
       |         GROUP BY pb.grp, pb.key),
       |bfex AS (SELECT DISTINCT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key
       |         FROM $table WHERE $keyCol IS NOT NULL)
       |SELECT mc.grp, mc.key, mc.might_contain,
       |       x.key IS NOT NULL AS is_member
       |FROM bfmc mc LEFT JOIN bfex x
       |  ON x.grp = mc.grp AND x.key = mc.key""".stripMargin

  /** Runtime semi-join prune: `probe` rows whose `probeKey` joins some
    * `build` row's `buildKey` — same rows as a plain left_semi, but the
    * probe side first streams through BfK broadcast-hash semi-joins
    * against the build bloom's registers (≤ BfM longs each, whatever
    * the build row count), so non-joining probe rows drop BEFORE the
    * exact join's shuffle. The exact left_semi at the end removes the
    * bloom's false positives — the prune is semantically transparent,
    * which is exactly what the oracle checks. */
  /** Saturation guard for the prune (ADVICE r12): once the build-side
    * key count pushes k·n well past m, the filter's fill fraction → 1
    * and the prune keeps ~every probe row (FP ≈ fill^k) while still
    * paying the bloom build plus BfK broadcast joins. Above this fill
    * the prune is skipped and only the exact semi-join runs. 0.5 keeps
    * the worst admitted FP rate at 0.5^BfK ≈ 6% — past that the joins
    * cost more than the rows they drop. */
  val BfMaxFill = 0.5

  /** NOTE (ADVICE r13): construction is EAGER — calling this runs one
    * bounded Spark job (the ≤ BfM-row register collect below) before
    * the returned DataFrame is ever executed, and the bloom registers
    * snapshot the build side AT CONSTRUCTION time. Under the immutable-
    * source contract every Spark plan assumes, this is invisible: the
    * trailing exact semi-join removes all false positives, so the
    * result equals a plain left_semi. But a caller that mutates
    * `build`'s source between construction and execution can LOSE rows
    * (the stale bloom prunes probe rows that only the new build rows
    * would match — a false negative the exact join never sees), and a
    * caller that never executes the result still paid the register
    * job. Callers needing lazy construction or mutating sources should
    * use a plain left_semi. */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String): DataFrame = {
    // One bounded action building the register set (the build pass a
    // runtime filter always pays). The collect is ≤ BfM rows by
    // construction (distinct bit positions of an m-bit filter — ≤ 512 KB
    // at BfM=65536), so materializing it driver-side makes the fill
    // probe free and turns each of the BfK broadcast joins into a
    // LocalRelation broadcast instead of BfK recomputations of the
    // build-side scan.
    val regRows = bfRegisters(build, lit(0L), col(buildKey))
      .select(col("b")).collect().map(_.getLong(0)).toIndexedSeq
    val fill = regRows.length.toDouble / BfM
    val spark = probe.sparkSession
    val pruned =
      if (fill > BfMaxFill) {
        // saturated filter: FP ≈ fill^BfK keeps ~every probe row — the
        // prune cannot prune, so don't pay its joins (ADVICE r12)
        System.err.println(f"[graft] bloomSemiJoin: filter saturated " +
          f"(fill $fill%.3f > $BfMaxFill) — skipping the bloom prune")
        probe
      } else {
        val regs = spark.createDataset(regRows)(
          org.apache.spark.sql.Encoders.scalaLong).toDF("b")
        bloomPrune(probe, probeKey, regs)
      }
    pruned.join(build.select(col(buildKey).as("__bf_bk")).distinct(),
      col(probeKey) === col("__bf_bk"), "left_semi")
  }

  /** The prune alone (exposed for the A/B that measures rows dropped):
    * keep probe rows all of whose BfK bit positions are set in `regs`
    * — one broadcast-hash left_semi per hash function, no shuffle on
    * the probe side. */
  def bloomPrune(probe: DataFrame, probeKey: String,
      regs: DataFrame): DataFrame =
    (0 until BfK).foldLeft(probe) { (df, i) =>
      df.join(broadcast(regs.select(col("b").as(s"__bf_r$i"))),
        bfBit(lit(i.toLong), col(probeKey).cast("string"))
          === col(s"__bf_r$i"), "left_semi")
    }

  // ------------------------------------------------------------------
  // Priority sampling (Duffield, Lund, Thorup, "Priority sampling for
  // estimation of arbitrary subset sums", JACM 2007) — the mergeable
  // WEIGHTED-SAMPLE sketch that completes the family the way
  // Misra–Gries completed frequency: MG keeps the keys whose weight is
  // provably heavy; the priority sample keeps a FIXED-SIZE weighted
  // sample of ALL keys, from which any subset's weight sum is
  // estimable (ŵ = max(w, τ) for sampled keys, τ = the (k+1)-th
  // priority). The uniform variate is derandomized through the key
  // hash (the KMV technique): u(key) = (hash54+1)/2^56 ∈ (0,1], so
  // priority w/u is INTRINSIC to (key, w) — both engines compute the
  // identical sample and the oracle hashes estimates directly.
  //
  // State = the top-(k+1) rows of (grp, key, w) by priority — k sample
  // rows plus the threshold row. MERGE = union + weight re-sum + one
  // re-trim: under key-disjoint slicing (partitioned corpora — the
  // JACM model, each item once) a key in the union's top-(k+1) is in
  // its own slice's top-(k+1), so merge == whole-corpus sample EXACTLY
  // (the KMV/MG semilattice argument; AnalyticsSpec asserts it). Under
  // key-SPLIT slicing the sample degrades one-sidedly: a key trimmed
  // from some slice re-enters with only its surviving mass — the same
  // graceful λ-style degradation the MG merge documents.
  // ------------------------------------------------------------------

  /** Sample size k (the state keeps k+1 rows — the (k+1)-th carries the
    * threshold priority τ). */
  val PsK = 32

  /** Priority = w / u(key) as DOUBLE (one division of identical inputs
    * on both engines — bit-identical, so the (desc, key asc) order is
    * too). The md5 slice is 14 hex chars = 56 bits, so u = (h+1)/2^56
    * ∈ (0, 1]; 2^56 is exactly representable. */
  private def psPrio(key: Column, w: Column): Column =
    w.cast("double") /
      ((hash54(concat(lit("ps:"), key)) + lit(1L)).cast("double") /
        lit(72057594037927936.0))

  /** One trim pass: keep the top-(PsK+1) rows per group by (priority
    * desc, key asc). The rank predicate gets Spark's WindowGroupLimit
    * pushdown — map-side top-(k+1), never a full per-group sort (the
    * sketch_mg plan gate's shape). */
  private[graft] def psTrim(s: DataFrame): DataFrame = {
    val win = Window.partitionBy(col("grp"))
      .orderBy(psPrio(col("key"), col("w")).desc, col("key").asc)
    s.withColumn("__ps_rn", row_number().over(win))
      .filter(col("__ps_rn") <= PsK + 1)
      .select(col("grp"), col("key"), col("w"))
  }

  /** The sketch state from a data slice: per-key weight sums, trimmed
    * to the top-(PsK+1) priorities per group. */
  def psSample(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column): DataFrame =
    psTrim(df.filter(keyCol.isNotNull && weightCol.isNotNull)
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(sum(weightCol.cast("long")).as("w")))

  /** Merge samples from data slices: weight re-sum per key (a no-op
    * under the key-disjoint contract), one re-trim. */
  def psMerge(samples: Seq[DataFrame]): DataFrame =
    psTrim(samples.reduce(_ unionByName _)
      .groupBy(col("grp"), col("key"))
      .agg(sum(col("w")).as("w")))

  /** Subset-sum estimates from a sample: the k sample rows with
    * ŵ = max(w, τ) — any subset S's weight sum is estimated by
    * Σ_{key ∈ S ∩ sample} ŵ. Groups holding ≤ PsK distinct keys have
    * no threshold row and estimate exactly (ŵ = w). Output
    * (grp, key, w, est). */
  def psEstimates(sample: DataFrame): DataFrame = {
    val win = Window.partitionBy(col("grp"))
      .orderBy(psPrio(col("key"), col("w")).desc, col("key").asc)
    val ranked = sample
      .select(col("grp"), col("key"), col("w"),
        psPrio(col("key"), col("w")).as("prio"))
      .withColumn("rn", row_number().over(win))
    val tau = ranked.filter(col("rn") === PsK + 1)
      .select(col("grp"), col("prio").as("tau"))
    ranked.filter(col("rn") <= PsK)
      .join(tau, Seq("grp"), "left")
      .select(col("grp"), col("key"), col("w"),
        greatest(col("w").cast("double"),
          coalesce(col("tau"), lit(0.0))).as("est"))
  }

  /** Build + estimate in one call — the oracle-checked entry shape. */
  def prioritySample(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column): DataFrame =
    psEstimates(psSample(df, groupCol, keyCol, weightCol))

  /** DuckDB twin of [[prioritySample]] — same hash-derandomized u, same
    * double priorities, same trim and threshold. */
  def prioritySampleSql(table: String, groupCol: String, keyCol: String,
      weightExpr: String): String =
    s"""WITH psa AS (SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key,
       |               CAST(SUM($weightExpr) AS BIGINT) AS w
       |             FROM $table
       |             WHERE $keyCol IS NOT NULL AND $weightExpr IS NOT NULL
       |             GROUP BY 1, 2),
       |psp AS (SELECT grp, key, w,
       |          CAST(w AS DOUBLE) /
       |            (CAST(CAST(('0x' || substr(md5('ps:' || key), 1, 14)) AS BIGINT) + 1
       |              AS DOUBLE) / 72057594037927936.0) AS prio
       |        FROM psa),
       |psr AS (SELECT grp, key, w, prio,
       |          ROW_NUMBER() OVER (PARTITION BY grp
       |            ORDER BY prio DESC, key ASC) AS rn
       |        FROM psp),
       |pst AS (SELECT grp, prio AS tau FROM psr WHERE rn = ${PsK + 1})
       |SELECT r.grp, r.key, r.w,
       |       GREATEST(CAST(r.w AS DOUBLE), COALESCE(t.tau, 0.0)) AS est
       |FROM psr r LEFT JOIN pst t ON t.grp = r.grp
       |WHERE r.rn <= $PsK""".stripMargin

  // ------------------------------------------------------------------
  // VarOpt sampling (Cohen, Duffield, Kaplan, Lund, Thorup, "Stream
  // sampling for variance-optimal estimation of subset sums", SODA
  // 2009) — the variance-OPTIMAL sibling of the priority sample: k kept
  // keys, subset-sum estimates Σŵ, with the minimum possible average
  // variance over all k-sample schemes (priority sampling is within a
  // factor but not optimal). Batch threshold form: τ solves
  // Σ min(wᵢ/τ, 1) = k — keys with w above the split kept EXACTLY
  // (ŵ = w), the rest sampled with inclusion probability wᵢ/τ and
  // ŵ = τ. Derandomized end to end so both engines draw the IDENTICAL
  // sample: the heavy/light split is found in exact BIGINT arithmetic
  // (w·(k−j) ≤ S_j, never a float compare), and the light pick is
  // SYSTEMATIC sampling over the md5-hash order with the inclusion
  // probabilities snapped to the 1e-6 integer grid (the pmi-embed grid
  // discipline) — the running sum that places the picks is an exact
  // BIGINT window sum, associative, so engine-internal summation order
  // can't flip a pick.
  //
  // Scale note: the light pick is one window sum over the group's keys
  // in hash order — a per-group sort, the same cost class as the exact
  // quantile entries (a systematic pick is inherently sequential). The
  // MERGEABLE weighted-sample path at 100 TB is [[psSample]]; VarOpt is
  // the one-pass batch sampler you run when variance matters more than
  // mergeability (e.g. drawing a fixed training subsample per group).
  // ------------------------------------------------------------------

  /** VarOpt sample size. */
  val VoK = 32

  private def voHash(key: Column): Column =
    hash54(concat(lit("vo:"), key))

  /** VarOpt_k sample with estimates — (grp, key, w, est): ~k rows per
    * group (grid rounding can shift the pick count by ±1); groups with
    * ≤ k keys are kept whole with est = w exactly. */
  def varOptSample(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column): DataFrame =
    voFromWeights(df.filter(keyCol.isNotNull && weightCol.isNotNull)
      .groupBy(groupCol.as("grp"), keyCol.cast("string").as("key"))
      .agg(sum(weightCol.cast("long")).as("w"))
      .filter(col("w") > 0L))

  /** [[varOptSample]]'s threshold procedure over pre-aggregated
    * per-key weights `w(grp, key, w)` — the seam the streamed merge
    * re-enters with summed shard estimates as the weights. */
  private def voFromWeights(w: DataFrame): DataFrame = {
    val tot = w.groupBy(col("grp"))
      .agg(sum(col("w")).as("totw"), count(lit(1)).as("n"))
    val win = Window.partitionBy(col("grp"))
      .orderBy(col("w").desc, col("key").asc)
    val ranked = w
      .withColumn("rn", row_number().over(win))
      .withColumn("pre", sum(col("w")).over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(tot, Seq("grp")).pinned
    // small groups: the sample is the group, exactly
    val small = ranked.filter(col("n") <= VoK)
      .select(col("grp"), col("key"), col("w"),
        col("w").cast("double").as("est"))
    val big = ranked.filter(col("n") > VoK)
    // the split: smallest j with w_(j+1)·(k−j) ≤ S_j (S_j = suffix sum
    // BELOW the j heaviest = totw − pre + w at row rn = j+1) — exact
    // BIGINT compare; τ = S_j/(k−j), ONE double division. Existence: at
    // rn = k the inequality always holds (S includes w_(k) itself).
    val cutWin = Window.partitionBy(col("grp")).orderBy(col("rn"))
    val cut = big
      .filter(col("rn") <= VoK &&
        col("w") * (lit(VoK.toLong) - col("rn") + 1L) <=
          col("totw") - col("pre") + col("w"))
      .withColumn("rw", row_number().over(cutWin))
      .filter(col("rw") === 1)
      .select(col("grp"), col("rn").as("cutrn"),
        ((col("totw") - col("pre") + col("w")).cast("double") /
          (lit(VoK.toLong) - col("rn") + 1L).cast("double")).as("tau"))
    val withCut = big.join(cut, Seq("grp"))
    val heavy = withCut.filter(col("rn") < col("cutrn"))
      .select(col("grp"), col("key"), col("w"),
        col("w").cast("double").as("est"))
    // systematic pick over the light keys in md5 order: pµ = the grid
    // inclusion probability; a key is picked iff its pµ mass crosses an
    // integer grid boundary of the running sum (Σpµ ≈ (k−j)·10⁶ ⇒ ~k−j
    // picks). p = 1 (w at τ) always crosses — picked with certainty.
    val pickWin = Window.partitionBy(col("grp"))
      .orderBy(voHash(col("key")), col("key"))
    val light = withCut.filter(col("rn") >= col("cutrn"))
      .withColumn("pmu",
        floor(col("w").cast("double") / col("tau") * lit(1e6) + lit(0.5))
          .cast("long"))
      .withColumn("cum", sum(col("pmu")).over(
        pickWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(expr("cum div 1000000") > expr("(cum - pmu) div 1000000"))
      .select(col("grp"), col("key"), col("w"), col("tau").as("est"))
    small.unionByName(heavy).unionByName(light)
  }

  /** VarOpt shard STATE from a data slice — the streamed form (r15,
    * VERDICT r14 #8): the sample's ADJUSTED weights (its estimates)
    * snapped to the 1e-6 integer grid, (grp, key, w) BIGINT
    * micro-units. VarOpt is mergeable by re-sampling the union of
    * samples under their adjusted weights (Cohen–Duffield–Kaplan–Lund–
    * Thorup, SODA 2009 §4 — the merged sample is a valid VarOpt_k of
    * the combined stream); the grid snap is what keeps the re-entry
    * weights exact BIGINTs so both the split and the systematic pick
    * stay derandomized through arbitrary merge trees. Quantization is
    * the merge's only approximation: ≤ 5·10⁻⁷ relative per fold,
    * against sample variance orders of magnitude larger. */
  def voState(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column): DataFrame =
    varOptSample(df, groupCol, keyCol, weightCol)
      .select(col("grp"), col("key"),
        floor(col("est") * lit(1e6) + lit(0.5)).cast("long").as("w"))

  /** All shards' [[voState]]s in ONE pass (r17, guide §2.4: two
    * operations keyed the same way share one exchange): the per-shard
    * threshold procedure is strictly group-local, so running it once
    * over the COMPOSITE (shard, grp) key is row-for-row identical to
    * one [[voState]] call per shard — while scanning and aggregating
    * the input once instead of once per shard. Output
    * (shard, grp, key, w) — slice by `shard` to recover each state
    * frame. Measured at sf0.1: sketch_vomerge's two-shard build, see
    * BASELINE.md r17. */
  def voStateSharded(df: DataFrame, shardCol: Column, groupCol: Column,
      keyCol: Column, weightCol: Column): DataFrame =
    voFromWeights(df.filter(keyCol.isNotNull && weightCol.isNotNull)
        .groupBy(struct(shardCol.as("s"), groupCol.as("g")).as("grp"),
          keyCol.cast("string").as("key"))
        .agg(sum(weightCol.cast("long")).as("w"))
        .filter(col("w") > 0L))
      .select(col("grp.s").as("shard"), col("grp.g").as("grp"), col("key"),
        floor(col("est") * lit(1e6) + lit(0.5)).cast("long").as("w"))

  /** Merge VarOpt shard states: per-key micro-weight SUM (a key split
    * across shards contributes each shard's unbiased estimate of its
    * share), then ONE re-run of the threshold procedure. Output
    * (grp, key, est) back in original weight units. Deterministic —
    * same shards in any merge order give the same sample. */
  def voMerge(states: Seq[DataFrame]): DataFrame =
    voFromWeights(states.reduce(_ unionByName _)
      .groupBy(col("grp"), col("key")).agg(sum(col("w")).as("w")))
      .select(col("grp"), col("key"),
        (col("est") / lit(1e6)).as("est"))

  /** One state-schema-preserving re-trim — the opt-in compaction trim
    * for streamed VarOpt state (the mg/ps retention story): ~k rows
    * survive, carrying their post-merge adjusted micro-weights. */
  private[graft] def voTrimState(state: DataFrame): DataFrame =
    voFromWeights(state)
      .select(col("grp"), col("key"),
        floor(col("est") + lit(0.5)).cast("long").as("w"))

  /** The threshold procedure of [[varOptSample]] as a reusable CTE
    * chain over a weights relation `$src(grp, key, w)` — the final
    * relation is `vres$sfx(grp, key, w, est)`. The suffix keeps CTE
    * names distinct when the procedure is instantiated more than once
    * in one query (the [[voMergeSql]] twin runs it three times). */
  private def voProcSql(src: String, sfx: String): String =
    s"""vt$sfx AS (SELECT grp, CAST(SUM(w) AS BIGINT) AS totw, COUNT(*) AS n
       |       FROM $src GROUP BY 1),
       |vr$sfx AS (SELECT v.grp, v.key, v.w, t.totw, t.n,
       |         ROW_NUMBER() OVER (PARTITION BY v.grp
       |           ORDER BY v.w DESC, v.key ASC) AS rn,
       |         CAST(SUM(v.w) OVER (PARTITION BY v.grp
       |           ORDER BY v.w DESC, v.key ASC
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
       |       FROM $src v JOIN vt$sfx t ON t.grp = v.grp),
       |vcut$sfx AS (SELECT grp, rn AS cutrn,
       |           CAST(totw - pre + w AS DOUBLE) /
       |             CAST($VoK - rn + 1 AS DOUBLE) AS tau
       |         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
       |                 ORDER BY rn) AS rw
       |               FROM vr$sfx
       |               WHERE n > $VoK AND rn <= $VoK
       |                 AND w * ($VoK - rn + 1) <= totw - pre + w)
       |         WHERE rw = 1),
       |vcum$sfx AS (SELECT r.grp, r.key, r.w, c.tau,
       |             CAST(FLOOR(CAST(r.w AS DOUBLE) / c.tau * 1e6 + 0.5)
       |               AS BIGINT) AS pmu
       |           FROM vr$sfx r JOIN vcut$sfx c ON c.grp = r.grp
       |           WHERE r.rn >= c.cutrn),
       |vpick$sfx AS (SELECT grp, key, w, tau, pmu,
       |           CAST(SUM(pmu) OVER (PARTITION BY grp
       |             ORDER BY CAST(('0x' || substr(md5('vo:' || key), 1, 14))
       |               AS BIGINT) ASC, key ASC
       |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |         FROM vcum$sfx),
       |vres$sfx AS (
       |  SELECT grp, key, w, CAST(w AS DOUBLE) AS est
       |  FROM vr$sfx WHERE n <= $VoK
       |  UNION ALL
       |  SELECT r.grp, r.key, r.w, CAST(r.w AS DOUBLE) AS est
       |  FROM vr$sfx r JOIN vcut$sfx c ON c.grp = r.grp
       |  WHERE r.rn < c.cutrn
       |  UNION ALL
       |  SELECT grp, key, w, tau AS est FROM vpick$sfx
       |  WHERE cum // 1000000 > (cum - pmu) // 1000000)""".stripMargin

  private def voWeightsSql(table: String, groupCol: String, keyCol: String,
      weightExpr: String, where: String = "TRUE"): String =
    s"""(SELECT $groupCol AS grp, CAST($keyCol AS VARCHAR) AS key,
       |              CAST(SUM($weightExpr) AS BIGINT) AS w
       |            FROM $table
       |            WHERE $keyCol IS NOT NULL AND $weightExpr IS NOT NULL
       |              AND ($where)
       |            GROUP BY 1, 2
       |            HAVING CAST(SUM($weightExpr) AS BIGINT) > 0)""".stripMargin

  /** DuckDB twin of [[varOptSample]] — same exact-integer split, same
    * grid-snapped systematic pick, same md5 pick order. */
  def varOptSampleSql(table: String, groupCol: String, keyCol: String,
      weightExpr: String): String =
    s"""WITH vw AS ${voWeightsSql(table, groupCol, keyCol, weightExpr)},
       |${voProcSql("vw", "")}
       |SELECT grp, key, w, est FROM vres""".stripMargin

  /** DuckDB twin of [[voState]] + [[voMerge]] over two complementary
    * shards of `table` (rows where `shardExpr` = 0 / = 1): each shard
    * runs the full threshold procedure, its estimates snap to the 1e-6
    * grid (the shard STATE), the union re-sums micro-weights per key
    * and the procedure runs once more — exactly [[voMerge]]'s fold, so
    * the merged estimates hash cross-engine. */
  def voMergeSql(table: String, groupCol: String, keyCol: String,
      weightExpr: String, shardExpr: String): String =
    s"""WITH vw0 AS ${voWeightsSql(table, groupCol, keyCol, weightExpr,
           s"($shardExpr) = 0")},
       |${voProcSql("vw0", "0")},
       |vw1 AS ${voWeightsSql(table, groupCol, keyCol, weightExpr,
           s"($shardExpr) = 1")},
       |${voProcSql("vw1", "1")},
       |vwm AS (SELECT grp, key, CAST(SUM(
       |          CAST(FLOOR(est * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w
       |        FROM (SELECT grp, key, est FROM vres0
       |              UNION ALL SELECT grp, key, est FROM vres1)
       |        GROUP BY 1, 2),
       |${voProcSql("vwm", "m")}
       |SELECT grp, key, est / 1e6 AS est FROM vresm""".stripMargin
}
