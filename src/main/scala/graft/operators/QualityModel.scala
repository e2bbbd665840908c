package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Pins.PinnedOps

/** Distillation of the heuristic quality gate into a trainable linear
  * model — the standard production move (heuristic labels → a cheap
  * learned filter, cf. fastText/CCNet-style quality classifiers), here
  * as distributed FULL-BATCH gradient descent expressed in DataFrame
  * ops: least-squares regression of the composite
  * [[TextAnalysis.qualityScore]] onto its own raw signals.
  *
  * Why least squares and not logistic: the gradient is pure +,·,
  * comparisons — no exp/log — so with grid-exact accumulation the
  * trained weights are BIT-IDENTICAL to the DuckDB twin (libm
  * transcendentals are not correctly-rounded and would break the hash
  * gate; sqrt is IEEE-exact, exp is not).
  *
  * Scale shape: one GD step = broadcast of the (d+1)-vector of weights,
  * one narrow residual pass over the corpus, one per-dimension
  * map-side-combined aggregation (the [[Embeddings]] power-step shape).
  * Fixed step count, d+1 doubles of driver state, nothing quadratic.
  * Gradient sums use the 1e-6 BIGINT grid (order-independent, oracle
  * re-derivable).
  */
object QualityModel {

  import Similarity.dot

  val nFeatures = 4 // bias, length score, punct ratio, stopword ratio

  /** Feature rows `(doc_id, x, y)` from the quality-gate signals; docs
    * whose ratios are NULL (empty text) are excluded on both sides. */
  def features(df: DataFrame, id: Column, text: Column): DataFrame =
    TextAnalysis.qualityScore(df, id, text)
      .filter(col("punct_ratio").isNotNull && col("stopword_ratio").isNotNull)
      .select(col("doc_id"),
        array(lit(1.0),
          least(col("n_chars_m") * lit(1.0) / 200.0, lit(1.0)),
          col("punct_ratio"), col("stopword_ratio")).as("x"),
        col("quality_score").as("y"))

  /** `iters` full-batch GD steps from w=0 with step size `2η = rate`:
    * w ← w − rate · (1/n)·Σ (x·w − y)·x. Returns the one-row weight
    * array `(w)`. */
  def gdWeights(feat: DataFrame, iters: Int, rate: Double): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val f = feat.pinned // consumed once per step
    var w = Seq(Tuple1(Seq.fill(nFeatures)(0.0))).toDF("w")
    for (_ <- 1 to iters) {
      val resid = f.crossJoin(broadcast(w))
        .select(col("x"), (dot(col("x"), col("w")) - col("y")).as("r"))
      val grads = resid
        .select(col("r"), posexplode(col("x")).as(Seq("pos", "xv")))
        .groupBy(col("pos"))
        .agg((sum(floor(col("xv") * col("r") * lit(1e6) + lit(0.5))
          .cast("long")).cast("double") / (lit(1e6) * count(lit(1)))).as("g"))
      w = grads.groupBy()
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("g")))),
          s => s.getField("g")).as("gv"))
        .crossJoin(w)
        .select(zip_with(col("w"), col("gv"),
          (a, b) => a - lit(rate) * b).as("w"))
        .pinned
    }
    w
  }

  /** Trained weights exploded per dimension `(pos, weight)`. */
  def distillWeights(df: DataFrame, id: Column, text: Column, iters: Int,
      rate: Double): DataFrame =
    gdWeights(features(df, id, text), iters, rate)
      .select(posexplode(col("w")).as(Seq("pos", "weight")))
      .orderBy(col("pos"))

  /** Per-doc fitted quality under the distilled model `(doc_id, fitted)`
    * — what the learned filter would ship instead of the heuristic. */
  def distillScores(df: DataFrame, id: Column, text: Column, iters: Int,
      rate: Double): DataFrame = {
    val f = features(df, id, text).pinned
    f.crossJoin(broadcast(gdWeights(f, iters, rate)))
      .select(col("doc_id"), dot(col("x"), col("w")).as("fitted"))
      .orderBy(col("doc_id"))
  }

  /** SQL twin: feature CTE `f(doc_id, x, y)` over
    * [[TextAnalysis.qualityScoreSql]] output CTE `q`, then one unrolled
    * (resid, grad, weight) block per GD step; final weights `w$iters(w)`.
    * Same grid constants, same sequential folds, same literals. */
  def gdCtesSql(table: String, iters: Int, rate: Double): String = {
    val d = nFeatures
    val head =
      s"""q AS (
         |${TextAnalysis.qualityScoreSql(table)}),
         |f AS (SELECT doc_id,
         |             [1.0, least(n_chars_m * 1.0 / 200.0, 1.0),
         |              punct_ratio, stopword_ratio] AS x,
         |             quality_score AS y
         |      FROM q
         |      WHERE punct_ratio IS NOT NULL AND stopword_ratio IS NOT NULL),
         |w0 AS (SELECT list_transform(generate_series(1, $d), i -> 0.0) AS w)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""r$t AS (SELECT f.doc_id, f.x, list_dot_product(f.x, w.w) - f.y AS r
         |       FROM f CROSS JOIN w${t - 1} w),
         |g$t AS (SELECT p.i AS pos,
         |         CAST(SUM(CAST(FLOOR(x[CAST(p.i + 1 AS INT)] * r * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |           / (1000000.0 * COUNT(*)) AS g
         |       FROM r$t CROSS JOIN range(0, $d) p(i) GROUP BY p.i),
         |gv$t AS (SELECT list(g ORDER BY pos) AS gv FROM g$t),
         |w$t AS (SELECT list_transform(generate_series(1, $d),
         |               i -> w.w[CAST(i AS INT)] - $rate * gv.gv[CAST(i AS INT)]) AS w
         |       FROM w${t - 1} w CROSS JOIN gv$t gv)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }
}
