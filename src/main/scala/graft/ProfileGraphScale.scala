package graft
import org.apache.spark.sql.functions._

/** Scale-stress for the round-8 bounded-iteration graph family (k-core
  * H-operator, HITS, harmonic BFS, FastRP) on the sf0.1 REFERENCES graph
  * replicated ×1/×3/×10 by id-offset copies (disjoint components — the
  * per-round shuffle volume grows linearly while round COUNT stays
  * fixed, so the claim under test is wall ∝ edges, not edges²; any
  * superlinear growth would indicate a hidden cross-component join).
  * Results recorded in BASELINE.md. */
object ProfileGraphScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-graph-scale")
    val edges = graft.queries.GraphQueries
      .refEdgesPublic(spark, "/root/testdata/sf0.1").cache()
    edges.count()
    // The ids to protect are the InMemoryRelation's persisted RDD ids, NOT
    // edges.rdd.id (each .rdd call deserializes a fresh RDD with a new id)
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gs] $l%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    // r9 A/B: pin cadence 1 (every round — the r8 behavior) vs 2 (unroll
    // two rounds per pin — VERDICT r8 #2) on the three single-consumer
    // fixed-point loops. harmonic/fastrp dropped from the sweep: their
    // loops keep multi-consumer frames and are untouched by the knob.
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(true))
    for (m <- Seq(1, 10)) {
      val e = (0 until m).map(i =>
          edges.select((col("src") + lit(i * 10000000L)).as("src"),
            (col("dst") + lit(i * 10000000L)).as("dst")))
        .reduce(_ unionByName _)
      for (p <- Seq(1, 2)) {
        t(s"kcore x$m p$p") {
          println("rows: " +
            graft.operators.Graph.kCoreFixed(e, 12, pinEvery = p).count())
        }
        sweep()
        // hitsFixed pins both score frames every round since the r11
        // total-reassociation restructure; no pin-cadence knob to sweep
        if (p == 1) {
          t(s"hits x$m") {
            println("rows: " +
              graft.operators.Graph.hitsFixed(e, 10).count())
          }
          sweep()
        }
        t(s"pagerank x$m p$p") {
          println("rows: " +
            graft.operators.Graph.pageRankFixed(e, 10, pinEvery = p).count())
        }
        sweep()
      }
    }
    spark.stop()
  }
}
