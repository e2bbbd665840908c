package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Analytic-function breadth beyond the reference's window surface:
  * lead/lag/ntile/percent_rank/cume_dist/first/last in one pass, exact
  * distributional stats (mean/stddev from integer power sums — bit-exact
  * across engines, unlike streaming variance), ROLLUP hierarchies, and an
  * approximate-distinct sketch (accuracy-bound oracle: HLL estimates differ by
  * engine; the spec bounds its error against the exact count).
  */
object AnalyticsQueries extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The full ranking/offset window family over per-customer orders.
    "win_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 10).as("pct_rank"),
          round(cume_dist().over(w), 10).as("cume"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Exact mean/stddev per language from integer power sums: Σx and Σx²
    // are exact in BIGINT, then one double formula — deterministic where
    // distributed streaming variance is not.
    "stats_by_lang" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_chars") * col("n_chars")).as("sum_sq"))
        .select(col("lang"), col("n"),
          (col("sum_chars").cast("double") / col("n")).as("mean_chars"),
          // null for singleton groups: (n-1)=0 would throw under ANSI
          // (Spark 4 default) where DuckDB yields NaN — diverging engines
          when(col("n") > 1,
            sqrt((col("sum_sq").cast("double") -
              col("sum_chars").cast("double") * col("sum_chars") / col("n")) /
              (col("n") - 1))).as("stddev_chars"))
        .orderBy(col("lang"))
    }),

    // ROLLUP hierarchy: order counts by (year, status) with subtotals and
    // a grand total — the standard drill-down cube slice.
    "rollup_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .rollup(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("order_year").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }),

    // Exact per-group median (r9): the value whose cumulative frequency
    // crosses (n+1) DIV 2, computed over the DISTINCT-value histogram —
    // the window runs over distinct (status, price) rows, not raw
    // orders, so the per-group sort stays proportional to value
    // cardinality at any scale (the approx-quantile sketch remains the
    // unbounded-cardinality path).
    "agg_exact_median" -> ((s, dir) => {
      val hist = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_totalprice"))
        .agg(count(lit(1)).as("c"))
      val byStatus = Window.partitionBy(col("o_orderstatus"))
      val w = byStatus.orderBy(col("o_totalprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(byStatus))
        .withColumn("k", expr("(n + 1) DIV 2"))
        .filter(col("cum") - col("c") < col("k") && col("k") <= col("cum"))
        .select(col("o_orderstatus"), col("o_totalprice").as("median_price"),
          col("n").as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // Exact per-group p90 (r10): the same distinct-value histogram
    // crossing as agg_exact_median at k = ⌈0.9·n⌉ = (9n+9) DIV 10 —
    // the tail-latency percentile every ops dashboard reads, exact
    // while the per-group sort stays ∝ value cardinality.
    "agg_exact_p90" -> ((s, dir) => {
      val hist = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_totalprice"))
        .agg(count(lit(1)).as("c"))
      val byStatus = Window.partitionBy(col("o_orderstatus"))
      val w = byStatus.orderBy(col("o_totalprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(byStatus))
        .withColumn("k", expr("(9 * n + 9) DIV 10"))
        .filter(col("cum") - col("c") < col("k") && col("k") <= col("cum"))
        .select(col("o_orderstatus"), col("o_totalprice").as("p90_price"),
          col("n").as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // Equi-width histogram (r10): per-status price distribution in
    // 20k-wide buckets — the data-profiling pass a pipeline runs before
    // choosing filters/splits. bucket = ⌊price/20000.0⌋: one IEEE
    // divide + floor, identical in both engines; one groupBy at any
    // scale.
    "agg_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"),
          floor(col("o_totalprice") / lit(20000.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderstatus"), col("bucket"))),

    // Z-order layout (r9): Morton value of (l_partkey, l_suppkey) per
    // lineitem — the multi-column data-skipping key OPTIMIZE ZORDER BY
    // clusters on. Pure BIGINT bit interleave (identical in any engine);
    // the range-partition WRITE path is Layout.zorderRepartition,
    // spec-asserted to tighten BOTH columns' per-file min/max.
    "lay_zorder" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.morton2(col("l_partkey"), col("l_suppkey"))
            .as("zval"))
        .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))),

    // Full CUBE over (year, status) with a money measure — all four
    // grouping sets in one pass (ROLLUP's lattice sibling).
    "agg_cube_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.TextFns.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("order_year").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }),

    // Cohort retention matrix: signup-week cohorts × active-week offset
    // (the product-analytics staple next to evt_funnel). Weeks truncate
    // to Monday identically in both engines; offsets are integer
    // day-diffs DIV 7.
    "evt_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      cohort.join(active, Seq("user_id"))
        .filter(col("w") >= col("cohort_week"))
        .select(unix_timestamp(col("cohort_week")).as("cohort_week_s"),
          expr("datediff(w, cohort_week) DIV 7").as("week_offset"))
        .groupBy(col("cohort_week_s"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort_week_s"), col("week_offset"))
    }),

    // Exact interpolated quantiles per group (Spark `percentile` and
    // DuckDB `quantile_cont` share the linear-interpolation definition;
    // integer inputs make the arithmetic identical).
    "quantiles_by_lang" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.5)).as("p50"),
          percentile(col("n_chars"), lit(0.9)).as("p90"))
        .orderBy(col("lang"))
    }),

    // HLL sketch (approx distinct users per event type) — bound-checked:
    // engines implement different sketches; AnalyticsSpec bounds the
    // error against the exact count instead.
    // The HLL estimate itself differs by engine, so the DRIVER-CHECKABLE
    // contract is the sketch's accuracy bound: Spark computes both the
    // sketch and the exact distinct and emits `within_bound_of_exact`; the
    // oracle asserts TRUE per group (plus the exact counts). The bound is
    // 4·rsd: rsd is ONE standard deviation of the HLL++ estimator, not a
    // hard envelope — once cardinalities leave sparse (exact) mode a
    // correct sketch legitimately exceeds 1σ for ~⅓ of groups, so a 1·rsd
    // gate would flake at scale while 4σ (~1 in 16k per group) stays a
    // real error detector at every SF.
    // Deterministic HLL (r10): BOTH engines compute the SAME md5-based
    // sketch — exact-integer registers and harmonic sum, grid-snapped
    // linear counting — so the oracle hashes the ESTIMATE itself, the
    // check sketch_approx_distinct's engine-native HLL++ can only
    // bound. The sketch property that matters at 100 TB: registers
    // merge associatively, a billion rows reduce to m=64 longs/group.
    "sketch_hll_exact" -> ((s, dir) =>
      graft.operators.Sketches.hllDistinct(Tables.events(s, dir),
          col("event_type"), col("user_id"))
        .select(col("grp").as("event_type"), col("exact_keys"),
          col("n_rows"), col("s"), col("v_empty"), col("estimate"))
        .orderBy(col("event_type"))),

    // Count–min sketch (r11): per-key frequency estimates for the
    // deterministic probe set user_id % 10 == 0, beside the exact
    // counts. Same md5 cell hashing in both engines, so the oracle
    // hashes the ESTIMATES; registers merge by per-cell SUM
    // (AnalyticsSpec proves merge == build-on-union exactly).
    "sketch_cm_exact" -> ((s, dir) =>
      graft.operators.Sketches.cmFrequency(Tables.events(s, dir),
          col("event_type"), col("user_id"), probeMod = 10L)
        .select(col("grp").as("event_type"), col("key").as("user_key"),
          col("exact_cnt"), col("cm_estimate"))
        .orderBy(col("event_type"), col("user_key"))),

    // Q-digest quantile sketch (r11): deterministic mergeable quantiles
    // over FLOOR(l_extendedprice) per return flag. The digest's node
    // set is integer-deterministic, so the estimates AND the node count
    // hash cross-engine; exact rank-r values ride along as the accuracy
    // witness.
    "sketch_qdigest" -> ((s, dir) =>
      graft.operators.Sketches.qdigestQuantiles(Tables.lineitem(s, dir),
          col("l_returnflag"), floor(col("l_extendedprice")).cast("long"),
          Seq((1, 4), (1, 2), (9, 10)))
        .select(col("grp").as("l_returnflag"), col("q"), col("rank"),
          col("est"), col("exact_disc"), col("digest_nodes"))
        .orderBy(col("l_returnflag"), col("q"))),

    // KMV sketch (r11): k-minimum-values registers — distinct estimate
    // plus PAIRWISE Jaccard between groups from registers alone (the
    // set-operation the HLL can't do). Same md5 hashes both engines, so
    // the oracle hashes estimates and register stats directly.
    "sketch_kmv" -> ((s, dir) =>
      graft.operators.Sketches.kmvDistinct(Tables.events(s, dir),
          col("event_type"), col("user_id"))
        .select(col("grp").as("event_type"), col("exact_keys"),
          col("regs"), col("kth_hash"), col("estimate"))
        .orderBy(col("event_type"))),

    "sketch_kmv_jaccard" -> ((s, dir) =>
      graft.operators.Sketches.kmvJaccard(Tables.events(s, dir),
          col("event_type"), col("user_id"))
        .orderBy(col("ga"), col("gb"))),

    // Misra–Gries heavy hitters (r12): the sketch that ENUMERATES the
    // frequent keys with ≤ k counters per group — the count–min can
    // only point-query keys you already hold. Canonical order-free
    // batch form (λ = (k+1)-th largest frequency), so the summary is
    // identical cross-engine and the oracle hashes the counters,
    // exact counts, and the f > n/(k+1) guarantee flags.
    "sketch_mg" -> ((s, dir) =>
      graft.operators.Sketches.mgHeavyHitters(Tables.events(s, dir),
          col("event_type"), col("user_id"))
        .select(col("grp").as("event_type"), col("key").as("user_key"),
          col("exact_cnt"), col("mg_est"), col("n_rows"), col("guaranteed"))
        .orderBy(col("event_type"), col("user_key"))),

    // Weighted Misra–Gries (r12): top suppliers by REVENUE per return
    // flag — heavy hitters by measure sum, the weighted-increment form
    // (a curation pipeline's "which sources dominate the token mass"
    // with ≤ k counters). Integral weights (floored price) keep both
    // engines exact.
    "sketch_mg_weighted" -> ((s, dir) =>
      graft.operators.Sketches.mgWeightedHeavyHitters(
          Tables.lineitem(s, dir), col("l_returnflag"), col("l_suppkey"),
          floor(col("l_extendedprice")).cast("long"))
        .select(col("grp").as("l_returnflag"), col("key").as("supp_key"),
          col("exact_sum"), col("mg_est"), col("w_total"), col("guaranteed"))
        .orderBy(col("l_returnflag"), col("supp_key"))),

    // Priority sampling (r13, Duffield–Lund–Thorup): the mergeable
    // fixed-size WEIGHTED sample over the same revenue-mass shape as
    // sketch_mg_weighted — MG answers "which keys are provably heavy",
    // the priority sample answers "estimate ANY subset's weight sum
    // from k kept rows". u derandomized through the key hash, so both
    // engines draw the identical sample and the estimates hash.
    "sketch_psample" -> ((s, dir) =>
      graft.operators.Sketches.prioritySample(
          Tables.lineitem(s, dir), col("l_returnflag"), col("l_suppkey"),
          floor(col("l_extendedprice")).cast("long"))
        .select(col("grp").as("l_returnflag"), col("key").as("supp_key"),
          col("w"), col("est"))
        .orderBy(col("l_returnflag"), col("supp_key"))),

    // VarOpt sampling (r14): the variance-OPTIMAL k-sample sibling of
    // sketch_psample — heavy keys kept exactly, light keys by a
    // grid-snapped systematic pick over the md5 order, so both engines
    // draw the identical sample and the oracle hashes the estimates.
    "sketch_vosample" -> ((s, dir) =>
      graft.operators.Sketches.varOptSample(
          Tables.lineitem(s, dir), col("l_returnflag"), col("l_suppkey"),
          floor(col("l_extendedprice")).cast("long"))
        .select(col("grp").as("l_returnflag"), col("key").as("supp_key"),
          col("w"), col("est"))
        .orderBy(col("l_returnflag"), col("supp_key"))),

    // Sharded VarOpt merge (r15): the sampling family's DISTRIBUTED
    // story made oracle-checkable — two complementary shards (orderkey
    // parity) each build their VarOpt state (estimates snapped to the
    // 1e-6 grid as BIGINT micro-weights), the merge re-sums per key and
    // re-runs the threshold procedure (VarOpt is mergeable under
    // adjusted weights, Cohen et al. SODA 2009 §4). Grid-snapped end to
    // end, so both engines draw the identical merged sample — the same
    // fold StreamingSketches.voEstimatesNow applies per micro-batch.
    "sketch_vomerge" -> ((s, dir) => {
      // r17 (guide §2.4): both parity shards' states in ONE scan/agg via
      // the composite (shard, grp) key — the threshold procedure is
      // group-local, so this is row-identical to the two independent
      // voState calls it replaces (oracle hash unchanged); voMerge's
      // per-key SUM then folds the shards from the single frame exactly
      // as it folded the two-frame union.
      val li = Tables.lineitem(s, dir)
      val st = graft.operators.Sketches.voStateSharded(li,
        pmod(col("l_orderkey"), lit(2)), col("l_returnflag"),
        col("l_suppkey"), floor(col("l_extendedprice")).cast("long"))
      graft.operators.Sketches.voMerge(Seq(st.drop("shard")))
        .select(col("grp").as("l_returnflag"), col("key").as("supp_key"),
          col("est"))
        .orderBy(col("l_returnflag"), col("supp_key"))
    }),

    // Bloom filter (r12): membership verdicts for the deterministic
    // probe set user_id % 10 == 0, probed against EVERY event type's
    // bloom — users of other types exercise the false-positive path,
    // is_member rides along as the exactness witness. Same md5 bits in
    // both engines, so the oracle hashes the verdicts themselves;
    // registers merge by distinct union (AnalyticsSpec proves
    // merge == build-on-union exactly).
    "sketch_bloom" -> ((s, dir) =>
      graft.operators.Sketches.bfMembership(Tables.events(s, dir),
          col("event_type"), col("user_id"), probeMod = 10L)
        .select(col("grp").as("event_type"), col("key").as("user_key"),
          col("might_contain"), col("is_member"))
        .orderBy(col("event_type"), col("user_key"))),

    // Runtime semi-join prune (r12): the j11 shape — orders of
    // high-balance customers — but the probe (fact) side streams
    // through the build side's broadcast bloom BEFORE the exact join's
    // shuffle. The result is identical to the plain semi-join (the
    // exact join removes the bloom's false positives), which is
    // precisely what the oracle checks; AnalyticsSpec measures the
    // probe rows the bloom drops.
    "sketch_bloom_prune" -> ((s, dir) =>
      graft.operators.Sketches.bloomSemiJoin(
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir).filter(col("c_acctbal") > 9000),
          "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "sketch_approx_distinct" -> ((s, dir) => {
      // ONE rsd constant feeds both the sketch and the 4σ bound — the
      // documented contract breaks silently if they ever drift apart
      val rsd = 0.02
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("au"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("exact_users"), col("n_events"),
          (abs(col("au") - col("exact_users")) <=
            col("exact_users") * lit(4 * rsd)).as("within_bound_of_exact"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "sketch_hll_exact" ->
      s"""SELECT grp AS event_type, exact_keys, n_rows, s, v_empty, estimate
         |FROM (${graft.operators.Sketches.hllDistinctSql("events",
              "event_type", "user_id")})
         |ORDER BY event_type""".stripMargin,

    "sketch_cm_exact" ->
      s"""SELECT grp AS event_type, key AS user_key, exact_cnt, cm_estimate
         |FROM (${graft.operators.Sketches.cmFrequencySql("events",
              "event_type", "user_id", 10L)})
         |ORDER BY event_type, user_key""".stripMargin,

    "sketch_qdigest" ->
      s"""SELECT grp AS l_returnflag, q, rank, est, exact_disc, digest_nodes
         |FROM (${graft.operators.Sketches.qdigestQuantilesSql("lineitem",
              "l_returnflag", "CAST(FLOOR(l_extendedprice) AS BIGINT)",
              Seq((1, 4), (1, 2), (9, 10)))})
         |ORDER BY l_returnflag, q""".stripMargin,

    "sketch_kmv" ->
      s"""SELECT grp AS event_type, exact_keys, regs, kth_hash, estimate
         |FROM (${graft.operators.Sketches.kmvDistinctSql("events",
              "event_type", "user_id")})
         |ORDER BY event_type""".stripMargin,

    "sketch_kmv_jaccard" ->
      s"""SELECT ga, gb, kmin, matches, j_est, inter_exact, union_exact, j_exact
         |FROM (${graft.operators.Sketches.kmvJaccardSql("events",
              "event_type", "user_id")})
         |ORDER BY ga, gb""".stripMargin,

    "sketch_mg" ->
      s"""SELECT grp AS event_type, key AS user_key, exact_cnt, mg_est,
         |       n_rows, guaranteed
         |FROM (${graft.operators.Sketches.mgHeavyHittersSql("events",
              "event_type", "user_id")})
         |ORDER BY event_type, user_key""".stripMargin,

    "sketch_mg_weighted" ->
      s"""SELECT grp AS l_returnflag, key AS supp_key, exact_sum, mg_est,
         |       w_total, guaranteed
         |FROM (${graft.operators.Sketches.mgWeightedHeavyHittersSql(
              "lineitem", "l_returnflag", "l_suppkey",
              "CAST(FLOOR(l_extendedprice) AS BIGINT)")})
         |ORDER BY l_returnflag, supp_key""".stripMargin,

    "sketch_psample" ->
      s"""SELECT grp AS l_returnflag, key AS supp_key, w, est
         |FROM (${graft.operators.Sketches.prioritySampleSql(
              "lineitem", "l_returnflag", "l_suppkey",
              "CAST(FLOOR(l_extendedprice) AS BIGINT)")})
         |ORDER BY l_returnflag, supp_key""".stripMargin,

    "sketch_vosample" ->
      s"""SELECT grp AS l_returnflag, key AS supp_key, w, est
         |FROM (${graft.operators.Sketches.varOptSampleSql(
              "lineitem", "l_returnflag", "l_suppkey",
              "CAST(FLOOR(l_extendedprice) AS BIGINT)")})
         |ORDER BY l_returnflag, supp_key""".stripMargin,

    "sketch_vomerge" ->
      s"""SELECT grp AS l_returnflag, key AS supp_key, est
         |FROM (${graft.operators.Sketches.voMergeSql(
              "lineitem", "l_returnflag", "l_suppkey",
              "CAST(FLOOR(l_extendedprice) AS BIGINT)",
              "l_orderkey % 2")})
         |ORDER BY l_returnflag, supp_key""".stripMargin,

    "sketch_bloom" ->
      s"""SELECT grp AS event_type, key AS user_key, might_contain, is_member
         |FROM (${graft.operators.Sketches.bfMembershipSql("events",
              "event_type", "user_id", 10L)})
         |ORDER BY event_type, user_key""".stripMargin,

    "sketch_bloom_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin,

    "sketch_approx_distinct" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS exact_users,
        |       COUNT(*) AS n_events,
        |       TRUE AS within_bound_of_exact
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "win_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       LAG(o_totalprice, 1) OVER w AS prev_price,
        |       LEAD(o_totalprice, 1) OVER w AS next_price,
        |       FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |       NTILE(4) OVER w AS quartile,
        |       ROUND(PERCENT_RANK() OVER w, 10) AS pct_rank,
        |       ROUND(CUME_DIST() OVER w, 10) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "stats_by_lang" ->
      """SELECT lang, COUNT(*) AS n,
        |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
        |       CASE WHEN COUNT(*) > 1 THEN
        |         sqrt((CAST(SUM(n_chars * n_chars) AS DOUBLE)
        |                - CAST(SUM(n_chars) AS DOUBLE) * SUM(n_chars) / COUNT(*))
        |              / (COUNT(*) - 1)) END AS stddev_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "quantiles_by_lang" ->
      """SELECT lang,
        |       quantile_cont(n_chars, 0.5) AS p50,
        |       quantile_cont(n_chars, 0.9) AS p90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "rollup_orders" ->
      """SELECT year(o_orderdate) AS order_year, o_orderstatus,
        |       COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
        |ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "agg_exact_median" ->
      """WITH h AS (SELECT o_orderstatus, o_totalprice,
        |                  CAST(COUNT(*) AS BIGINT) AS c
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus, o_totalprice, c,
        |             SUM(c) OVER (PARTITION BY o_orderstatus
        |               ORDER BY o_totalprice
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |             SUM(c) OVER (PARTITION BY o_orderstatus) AS n
        |      FROM h)
        |SELECT o_orderstatus, o_totalprice AS median_price,
        |       CAST(n AS BIGINT) AS n_orders
        |FROM r WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |ORDER BY o_orderstatus""".stripMargin,

    "agg_exact_p90" ->
      """WITH h AS (SELECT o_orderstatus, o_totalprice,
        |                  CAST(COUNT(*) AS BIGINT) AS c
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus, o_totalprice, c,
        |             SUM(c) OVER (PARTITION BY o_orderstatus
        |               ORDER BY o_totalprice
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |             SUM(c) OVER (PARTITION BY o_orderstatus) AS n
        |      FROM h)
        |SELECT o_orderstatus, o_totalprice AS p90_price,
        |       CAST(n AS BIGINT) AS n_orders
        |FROM r WHERE cum - c < (9 * n + 9) // 10 AND (9 * n + 9) // 10 <= cum
        |ORDER BY o_orderstatus""".stripMargin,

    "agg_histogram" ->
      """SELECT o_orderstatus,
        |       CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket,
        |       COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY o_orderstatus, bucket""".stripMargin,

    "lay_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
         |       ${graft.operators.Layout.morton2Sql("l_partkey", "l_suppkey")} AS zval
         |FROM lineitem
         |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin,

    "agg_cube_orders" ->
      """SELECT year(o_orderdate) AS order_year, o_orderstatus,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (year(o_orderdate), o_orderstatus)
        |ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "evt_retention" ->
      """WITH c AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
        |j AS (SELECT c.cohort_week, a.w FROM c JOIN a USING (user_id)
        |      WHERE a.w >= c.cohort_week)
        |SELECT CAST(floor(epoch(cohort_week)) AS BIGINT) AS cohort_week_s,
        |       CAST(date_diff('day', CAST(cohort_week AS DATE), CAST(w AS DATE)) // 7 AS BIGINT) AS week_offset,
        |       COUNT(*) AS n_active
        |FROM j GROUP BY 1, 2
        |ORDER BY cohort_week_s, week_offset""".stripMargin
  )
}
