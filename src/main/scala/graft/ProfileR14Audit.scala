package graft
import org.apache.spark.sql.functions._

/** Round-14 audit of the r13 "prelude class" (VERDICT r13 #6):
  * multi-consumer LAZY inputs that are NOT loop-carried frames — the
  * class the g_articlerank_capped prelude cache fixed (−46%). Candidates
  * from the verdict, with their consumer counts read from source:
  *
  *  - `ppmiMatrix(cooc)` (g_pmi_embed2 / g_pmi_embed): `cooc` is the
  *    walk-pair self-join + groupBy — LAZY, consumed 3× (grand total,
  *    marginals, main join). Its own inputs are the pinned per-step walk
  *    frames, so a re-evaluation redoes the pair join + shuffle, not the
  *    walks. Exchange reuse MAY dedup the three branches (identical
  *    aggregate exchange subtree in one plan) — measured here.
  *
  *  - `jaccardSimilarity`-family `adj0` (g_jaccard_parts /
  *    g_overlap_parts / g_wjaccard_parts): scan + distinct, consumed 3×
  *    (degree table + both self-join sides). The self-join sides are the
  *    canonical ReuseExchange case; the degree branch shares the same
  *    distinct exchange — measured here.
  *
  *  - `betweennessFixed`: inspected, NOT measured — the edge input is
  *    `.cache()`d and every frontier/level/delta frame is pinned; there
  *    is no uncached multi-consumer lazy input.
  *
  * Protocol: 3 reps per variant, interleaved, cache swept between runs;
  * medians → BASELINE.md. The "pinned" variant localCheckpoints the
  * candidate input ONCE (the r13 fix shape); "lazy" is the shipped code.
  */
object ProfileR14Audit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-r14-audit")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def t(l: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[audit] $l%-28s $s%7.2fs"); s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.operators.Graph
    import graft.queries.GraphQueries.refEdgesPublic

    val sections = sys.env.getOrElse("SPARK_GRAFT_AB", "pmi,jaccard")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

    // --- 1. g_pmi_embed2: cooc lazy (shipped) vs pinned once ---------
    def cooc() = Graph.walkCooccurrence(
      Graph.randomWalks(refEdgesPublic(spark, dir), startMax = 500L,
        steps = 5), 2)
    if (sections("pmi")) {
      noop(Graph.pmiEmbed2(cooc(), 5)); sweep() // warm-up
      for (i <- 1 to 3) {
        t(s"pmi cooc lazy   #$i") { noop(Graph.pmiEmbed2(cooc(), 5)) }
        sweep()
        t(s"pmi cooc pinned #$i") {
          noop(Graph.pmiEmbed2(graft.plans.Pins.pin(cooc()), 5))
        }
        sweep()
      }
    }

    // --- 2. g_jaccard_parts: adj0 lazy (shipped) vs pinned once ------
    // inline copy of jaccardSimilarity with the candidate pin seam —
    // measurement twin, oracle parity untouched
    def jaccardWith(pin: Boolean): org.apache.spark.sql.DataFrame = {
      val membership = Tables.lineitem(spark, dir)
        .select(col("l_partkey").as("src"), col("l_orderkey").as("dst"))
      val adjL = membership
        .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
      val adj = if (pin) graft.plans.Pins.pin(adjL) else adjL
      val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
      val inter = adj.as("a")
        .join(adj.as("b"), col("a.dst") === col("b.dst") &&
          col("a.src") < col("b.src"))
        .groupBy(col("a.src").as("id_a"), col("b.src").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(deg.as("da"), col("da.src") === col("id_a"))
        .join(deg.as("db"), col("db.src") === col("id_b"))
        .select(col("id_a"), col("id_b"),
          (col("inter") * lit(1.0) /
            (col("da.deg") + col("db.deg") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= lit(0.05))
    }
    if (sections("jaccard")) {
      noop(jaccardWith(pin = false)); sweep() // warm-up
      for (i <- 1 to 3) {
        t(s"jaccard adj lazy   #$i") { noop(jaccardWith(pin = false)) }
        sweep()
        t(s"jaccard adj pinned #$i") { noop(jaccardWith(pin = true)) }
        sweep()
      }
    }
  }
}
