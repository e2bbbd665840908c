package graft
import org.apache.spark.sql.functions._

/** One-off stage breakdown for `g_articlerank_capped` at sf0.1
  * (r13: decide heavy-tier placement from where the 100 s goes). */
object ProfileArcCapped {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-arc")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[arc] $l%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    import graft.operators.Graph
    import graft.queries.GraphQueries.refEdgesPublic
    val e = refEdgesPublic(spark, dir)
    val closure = t("closure") {
      val c = Graph.kHopReach(e, 10, maxPairs = Some(1000000L))
      println("closure pairs: " + c.count()); c
    }
    val ends = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("entity"), col("l_partkey").as("node"))
      .distinct()
    val proj = t("projection") {
      val p = Graph.projectViaClosure(ends, closure).cache()
      println("proj edges: " + p.count()); p
    }
    t("pagerank10") {
      println("ranked: " + Graph.pageRankFixed(proj, iters = 10).count())
    }
    spark.stop()
  }
}
