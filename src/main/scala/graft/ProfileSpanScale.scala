package graft
import org.apache.spark.sql.functions._

/** Scale-stress for the duplicate-span pass: corpus ×1/×3/×10 via
  * id-offset copies (adversarial — EVERY window becomes a repeat, so
  * hits = all windows and the island merge runs at full volume). The
  * claim under test: wall time and output grow ~linearly in corpus
  * size — there is no candidate join to go quadratic (contrast the
  * round-7 LSH band stress, which had one and needed the rowsPerBand
  * knob). Results recorded in BASELINE.md. */
object ProfileSpanScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-span-scale")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ss] $l%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    for (m <- Seq(1, 3, 10)) {
      val corpus = (0 until m).map(i =>
          docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text")))
        .reduce(_ unionByName _)
      // warm once (codegen), then timed
      val q = graft.operators.Dedup.duplicateSpans(corpus, col("doc_id"),
        col("text"), 15)
      t(s"spans x$m")(println("rows: " + q.count()))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
