package graft
import org.apache.spark.sql.functions._

/** Records the TRUE cost of the reference's uncapped `*1..10` closure
  * projections at sf0.1 (VERDICT r9 #1): these queries OOM the default
  * 20 GB bench driver — run this with SPARK_DRIVER_MEM=90g to measure
  * the closure row count, the projected-edge count, and wall per stage,
  * so BASELINE.md carries a number instead of only "DNF". */
object ProfileClosure {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-closure")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[closure] $l%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    import graft.operators.Graph
    val edges = graft.queries.GraphQueries.refEdgesPublic(spark, dir).cache()
    println("[closure] edges: " + edges.count() +
      ", nodes: " + edges.select(col("src")).union(edges.select(col("dst")))
        .distinct().count())
    val reach = t("kHopReach(10)") {
      val r = graft.plans.Pins.pin(Graph.kHopReach(edges, 10))
      println("[closure] closure pairs: " + r.count()); r
    }
    // the exact authorship projection g_articlerank_customers uses
    val auth = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("entity"), col("l_partkey").as("node"))
      .distinct()
    val proj = t("projectViaClosure") {
      val p = graft.plans.Pins.pin(Graph.projectViaClosure(auth, reach))
      println("[closure] projected edges: " + p.count()); p
    }
    t("pageRankFixed(10)") {
      println("[closure] ranked nodes: " +
        Graph.pageRankFixed(proj, iters = 10).count())
    }
    spark.stop()
  }
}
