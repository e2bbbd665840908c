package graft
import org.apache.spark.sql.functions._

/** Scale-stress for the r9 component family on the sf0.1 REFERENCES
  * graph replicated ×1/×10 (disjoint id-offset copies — linear data
  * growth, fixed structure): min-label CC (O(diameter) rounds) vs
  * star-contraction CC (O(log n) rounds) vs directed SCC (FW-BW
  * refinement). The claim under test: star's round count — and
  * therefore its job count, the cost that dominates this family — stays
  * flat while volume grows. Results recorded in BASELINE.md. */
object ProfileCcScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-cc-scale")
    val edges = graft.queries.GraphQueries
      .refEdgesPublic(spark, "/root/testdata/sf0.1").cache()
    edges.count()
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $l%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(true))
    for (m <- Seq(1, 10)) {
      val e = (0 until m).map(i =>
          edges.select((col("src") + lit(i * 10000000L)).as("src"),
            (col("dst") + lit(i * 10000000L)).as("dst")))
        .reduce(_ unionByName _)
      t(s"cc-minlabel x$m") {
        println("comps: " + graft.operators.Graph
          .connectedComponents(e, maxIters = 100)
          .select("component").distinct().count())
      }
      sweep()
      t(s"cc-star x$m") {
        println("comps: " + graft.operators.Graph
          .connectedComponentsStar(e)
          .select("component").distinct().count())
      }
      sweep()
      t(s"scc x$m") {
        println("sccs: " + graft.operators.Graph
          .stronglyConnectedComponents(e)
          .select("component").distinct().count())
      }
      sweep()
    }
    spark.stop()
  }
}
