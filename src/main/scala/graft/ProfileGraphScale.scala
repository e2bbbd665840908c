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
    for (m <- Seq(1, 3, 10)) {
      val e = (0 until m).map(i =>
          edges.select((col("src") + lit(i * 10000000L)).as("src"),
            (col("dst") + lit(i * 10000000L)).as("dst")))
        .reduce(_ unionByName _)
      t(s"kcore x$m") {
        println("rows: " + graft.operators.Graph.kCoreFixed(e, 12).count())
      }
      t(s"hits x$m") {
        println("rows: " + graft.operators.Graph.hitsFixed(e, 10).count())
      }
      t(s"harmonic x$m") {
        println("rows: " + graft.operators.Graph
          .harmonicFixed(e, Seq(0L, 1L, 2L, 3L, 4L), 8).count())
      }
      t(s"fastrp x$m") {
        println("rows: " + graft.operators.Graph.fastRpFixed(e, 8, 3).count())
      }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
