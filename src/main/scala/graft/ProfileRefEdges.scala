package graft
import org.apache.spark.sql.functions._
object ProfileRefEdges {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "prof-refedges")
    val dir = "/root/testdata/sf0.1"
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[re] $l%-22s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    def mat(df: org.apache.spark.sql.DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    Tables.lineitem(spark, dir).count() // warm footer
    val e = graft.queries.GraphQueries.refEdgesPublic(spark, dir)
    t("refEdges warm1")(mat(e))
    t("refEdges warm2")(mat(graft.queries.GraphQueries.refEdgesPublic(spark, dir)))
    t("louvain full")(mat(graft.queries.GraphQueries.queries("g_louvain")(spark, dir)))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    t("louvain full 2")(mat(graft.queries.GraphQueries.queries("g_louvain")(spark, dir)))
    spark.stop()
  }
}
