package graft
import org.apache.spark.sql.functions._

/** Round-12 quiet same-session A/Bs (VERDICT r11 #4 and #6):
  *
  *  1. refEdges pin at multi-consumer query sites (commit c14b722):
  *     g_modularity with the REFERENCES edge derivation pinned once
  *     (current) vs re-derived per consumer (old) — the r11 change
  *     never got a clean A/B before the session turned windy.
  *
  *  2. Scoped AQE-off around hitsFixed: r11 measured g_hits alone
  *     −21% with AQE off globally (its two per-round branches get
  *     serialized by AQE's stage-by-stage execution) while every other
  *     loop got 2.5–3× WORSE — so the only shippable shape is a wrap
  *     scoped to the one operator. Measured here before adopting.
  *
  * 3 reps per variant, interleaved, medians compared; results recorded
  * in BASELINE.md. */
object ProfileR12AB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-r12-ab")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def t(l: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $l%-28s $s%7.2fs"); s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.queries.GraphQueries.refEdgesPublic
    import graft.operators.Graph

    // section filter: SPARK_GRAFT_AB=modularity,hits (default both)
    val sections = sys.env.getOrElse("SPARK_GRAFT_AB", "modularity,hits")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

    // --- 1. refEdges pin: g_modularity old (re-derive ×2) vs new (pin) ---
    def modularityPinned(): Unit = {
      val e = graft.plans.Pins.pin(refEdgesPublic(spark, dir))
      noop(Graph.modularity(e, Graph.labelPropagation(e, iters = 10)))
    }
    def modularityUnpinned(): Unit = {
      val e1 = refEdgesPublic(spark, dir)
      val e2 = refEdgesPublic(spark, dir)
      noop(Graph.modularity(e1, Graph.labelPropagation(e2, iters = 10)))
    }
    if (sections("modularity")) {
      modularityPinned(); sweep() // warm-up (codegen, file footers)
      for (i <- 1 to 3) {
        t(s"modularity pinned #$i") { modularityPinned() }; sweep()
        t(s"modularity unpinned #$i") { modularityUnpinned() }; sweep()
      }
    }

    // --- 2. hitsFixed: AQE on vs the scoped AQE-off wrap. r13: the wrap
    // was ADOPTED inside hitsFixed (r12) and moved onto a cloned session
    // (r13), so the "on" arm must call the no-wrap seam — hitsFixed
    // itself IS the "scoped-off" arm now (ADVICE r12: both arms of the
    // old harness measured the identical AQE-off configuration once the
    // wrap was internal). ---
    if (sections("hits")) {
      val edges = refEdgesPublic(spark, dir)
      def hitsAqeOn(): Unit = noop(Graph.hitsFixedNoWrap(edges, 10))
      def hitsAqeScopedOff(): Unit = noop(Graph.hitsFixed(edges, 10))
      hitsAqeOn(); sweep()
      for (i <- 1 to 3) {
        t(s"hits aqe-on #$i") { hitsAqeOn() }; sweep()
        t(s"hits aqe-scoped-off #$i") { hitsAqeScopedOff() }; sweep()
      }
    }
    spark.stop()
  }
}
