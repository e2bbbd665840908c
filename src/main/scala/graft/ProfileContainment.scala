package graft
import org.apache.spark.sql.functions._
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "prof-containment")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[pc] $l%-26s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    val q = graft.operators.Dedup.containmentPairs(docs, col("doc_id"), col("text"), 12, 0.5)
    t("full containment")(println("out: " + q.count()))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val q2 = graft.operators.Dedup.containmentPairs(docs, col("doc_id"), col("text"), 12, 0.5)
    t("full containment warm")(println("out: " + q2.count()))
    println(q.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate") || l.contains("Sort")).mkString("\n"))
    spark.stop()
  }
}
