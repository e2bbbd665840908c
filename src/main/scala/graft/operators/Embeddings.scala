package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Pins.PinnedOps

/** Embedding-corpus analytics beyond nearest-neighbor search: the
  * dominant principal component via matrix-free power iteration, and
  * per-vector component scores (the standard outlier-pruning / drift
  * signal over a training-data embedding table).
  *
  * Matrix-free: the covariance is never materialized. One power step is
  * w ← normalize(Σᵢ cᵢ·(cᵢ·w)) over centered vectors cᵢ — i.e. one
  * broadcast of the d-vector `w`, one narrow projection pass, and one
  * per-dimension aggregation. At 100 TB that is a fixed number of
  * map-side-combined passes with only d doubles of driver state, the
  * same shape Spark MLlib's RowMatrix power methods use; no |corpus|²
  * and no d×d shuffle anywhere.
  *
  * Reproducibility contract (the [[Similarity.kMeansCentroids]]
  * discipline): per-dimension sums snap each term to a 1e-6 grid and
  * accumulate as BIGINT, so results are independent of partition order
  * and bit-identical to the DuckDB twin; dot products and norms are
  * sequential left folds (`list_dot_product` order). Fixed iteration
  * count, not convergence, keeps the twin an unrolled CTE chain. At
  * larger corpora the grid constant coarsens (term·1e6 must stay within
  * BIGINT × |rows|); that trades reproducibility granularity, not
  * correctness.
  */
object Embeddings {

  import Similarity.{vecD, dot}

  /** Per-dimension exact-grid mean of the corpus as a one-row array
    * `(mv)` — broadcast back for centering. */
  private def meanVec(e: DataFrame): DataFrame =
    e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg((sum(floor(col("x") * lit(1e6) + lit(0.5)).cast("long"))
        .cast("double") / (lit(1e6) * count(lit(1)))).as("m"))
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mv"))

  /** Centered corpus `(vec_id, c)` — pinned, consumed once per power
    * step. */
  def centered(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), vecD(col("embedding")).as("v"))
    e.crossJoin(broadcast(meanVec(e)))
      .select(col("vec_id"),
        zip_with(col("v"), col("mv"), (a, b) => a - b).as("c"))
      .pinned
  }

  /** Dominant principal component after `iters` power steps from the
    * all-ones start vector. Returns one row per dimension
    * `(pos, loading)`. */
  def dominantComponent(emb: DataFrame, iters: Int, dim: Int): DataFrame =
    powerVector(centered(emb), iters, dim)
      .select(posexplode(col("w")).as(Seq("pos", "loading")))
      .orderBy(col("pos"))

  /** Per-vector score along the dominant component: `cᵢ·w` — the 1-D
    * PCA projection used for outlier pruning and corpus drift checks. */
  def componentScores(emb: DataFrame, iters: Int, dim: Int): DataFrame = {
    val c = centered(emb)
    c.crossJoin(broadcast(powerVector(c, iters, dim)))
      .select(col("vec_id"), dot(col("c"), col("w")).as("score"))
      .orderBy(col("vec_id"))
  }

  /** The power loop over a pre-centered corpus: one-row `(w)` array. */
  def powerVector(c: DataFrame, iters: Int, dim: Int): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    var w = Seq(Tuple1(Seq.fill(dim)(1.0))).toDF("w")
    for (_ <- 1 to iters) {
      val scored = c.crossJoin(broadcast(w))
        .select(col("c"), dot(col("c"), col("w")).as("s"))
      val sums = scored
        .select(col("s"), posexplode(col("c")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg((sum(floor(col("x") * col("s") * lit(1e6) + lit(0.5))
          .cast("long")).cast("double") / lit(1e6)).as("u"))
      w = sums.groupBy()
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("u")))),
          s => s.getField("u")).as("uv"))
        .select(col("uv"), sqrt(dot(col("uv"), col("uv"))).as("nrm"))
        .select(transform(col("uv"), x => x / col("nrm")).as("w"))
        .pinned
    }
    w
  }

  /** SQL twin: unrolled CTE chain over a CTE `src(vec_id, v)` (default
    * `e`); the final component is `w$iters(w)`, centered corpus is
    * `c(vec_id, c)`. Same grid constants, same sequential folds. */
  def powerCtesSql(iters: Int, dim: Int, src: String = "e"): String = {
    val mean =
      s"""mean AS (SELECT r.i AS pos,
         |         CAST(SUM(CAST(FLOOR($src.v[CAST(r.i + 1 AS INT)] * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |           / (1000000.0 * COUNT(*)) AS m
         |       FROM $src CROSS JOIN range(0, $dim) r(i) GROUP BY r.i),
         |mv AS (SELECT list(m ORDER BY pos) AS mv FROM mean),
         |c AS (SELECT vec_id, list_transform(generate_series(1, $dim),
         |              i -> $src.v[CAST(i AS INT)] - mv.mv[CAST(i AS INT)]) AS c
         |      FROM $src CROSS JOIN mv),
         |w0 AS (SELECT list_transform(generate_series(1, $dim), i -> 1.0) AS w)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""s$t AS (SELECT c.c AS c, list_dot_product(c.c, w.w) AS s
         |       FROM c CROSS JOIN w${t - 1} w),
         |u$t AS (SELECT r.i AS pos,
         |         CAST(SUM(CAST(FLOOR(c[CAST(r.i + 1 AS INT)] * s * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |           / 1000000.0 AS u
         |       FROM s$t CROSS JOIN range(0, $dim) r(i) GROUP BY r.i),
         |uv$t AS (SELECT list(u ORDER BY pos) AS uv FROM u$t),
         |w$t AS (SELECT list_transform(uv, x -> x / sqrt(list_dot_product(uv, uv))) AS w
         |       FROM uv$t)""".stripMargin
    }
    (mean +: rounds).mkString(",\n")
  }
}
