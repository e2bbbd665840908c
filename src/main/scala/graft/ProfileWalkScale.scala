package graft
import org.apache.spark.sql.functions._

/** Scale-stress for the r9 walk→embedding training chain (VERDICT r9
  * #3): `randomWalks` → `walkCooccurrence` → `pmiEmbed2` on the sf0.1
  * REFERENCES graph, along the two axes that can hurt at 100×:
  *
  *  - DENSITY (×10 walk starts on the SAME graph): the risk the verdict
  *    named — the PPMI pair table's distinct (a,b) count can grow
  *    superlinearly while walks overlap, until it saturates at the
  *    ±window reachability set of the graph;
  *  - VOLUME (×10 disjoint id-offset graph copies, per-copy walk
  *    corpus): linear data growth at fixed structure — the pure
  *    throughput axis, pair table must grow exactly linearly.
  *
  * Prints walk rows, distinct cooc pairs, and wall per stage; the ×10/×1
  * ratios go to BASELINE.md. */
object ProfileWalkScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-walk-scale")
    import graft.operators.Graph
    val edges = graft.queries.GraphQueries
      .refEdgesPublic(spark, "/root/testdata/sf0.1").cache()
    edges.count()
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[walk] $l%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(true))
    def chain(label: String, walks: org.apache.spark.sql.DataFrame): Unit = {
      val w = t(s"$label walks") {
        val p = graft.plans.Pins.pin(walks)
        println("  walk rows: " + p.count()); p
      }
      val cooc = t(s"$label cooc") {
        val c = graft.plans.Pins.pin(Graph.walkCooccurrence(w, 2))
        println("  distinct pairs: " + c.count()); c
      }
      t(s"$label pmi_embed2") {
        println("  emb rows: " + Graph.pmiEmbed2(cooc, 5).count())
      }
      sweep()
    }
    // DENSITY axis: same graph, 10x the walk starts
    for (sm <- Seq(500L, 5000L))
      chain(s"density sm=$sm", Graph.randomWalks(edges, sm, steps = 5))
    // VOLUME axis: x1 / x10 disjoint copies, 500 starts per copy
    for (m <- Seq(1, 10)) {
      val corpus = (0 until m).map { i =>
        val off = i * 10000000L
        Graph.randomWalks(edges, 500L, steps = 5)
          .select((col("walk_id") + lit(off)).as("walk_id"), col("step"),
            (col("node") + lit(off)).as("node"))
      }.reduce(_ unionByName _)
      chain(s"volume x$m", corpus)
    }
    spark.stop()
  }
}
