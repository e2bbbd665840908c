package graft
import org.apache.spark.sql.functions._

/** Volume stress for the COMPOSED training-data pipeline
  * (`pipe_end_to_end`'s exact stage chain — [[graft.queries
  * .TextPipelineQueries.pipePerDoc]] → [[graft.queries
  * .TextPipelineQueries.pipePairs]] → [[graft.queries
  * .TextPipelineQueries.pipeTail]]) at sf0.1 ×1/×10 (VERDICT r12 #6:
  * the ×10 evidence must postdate the r12 stage-function restructure).
  *
  * Replication = id-offset copies with per-replica consonant/vowel
  * ROTATION (`translate` over a 10-char class, 10 distinct rotations):
  * a byte-identical ×10 copy would make every replica family a MinHash
  * near-dup CLIQUE (pair count ×45, cluster diameter 10) and measure
  * the dedup on a corpus shape that never occurs; rotation keeps each
  * replica's INTERNAL near-dup structure bit-identical (translation is
  * a per-replica bijection of shingles) while cross-replica Jaccard
  * falls far below the 0.8 threshold — ×10 volume, same topology, the
  * linear-growth claim actually under test. Stage timings are printed
  * per multiplier; the composed wall is the BASELINE.md number. */
object ProfilePipe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-pipe")
    val dir = "/root/testdata/sf0.1"
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $l%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    import graft.queries.TextPipelineQueries._

    val docs0 = Tables.documents(spark, dir).cache()
    docs0.count()
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(true))

    val cls = "aeiousnrtl" // vowels + the most frequent consonants
    def replicated(m: Int) = (0 until m).map { i =>
      val rot = cls.drop(i % cls.length) + cls.take(i % cls.length)
      docs0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        translate(col("text"), cls, rot).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)

    // warm-up (codegen, file footers) — composed ×1, untimed
    mat(pipeTail(pipePerDoc(replicated(1)), pipePairs(pipePerDoc(replicated(1)))))
    sweep()
    for (m <- Seq(1, 10)) {
      val docs = replicated(m)
      t(s"perDoc x$m") { mat(pipePerDoc(docs)) }; sweep()
      t(s"pairs x$m") { mat(pipePairs(pipePerDoc(docs))) }; sweep()
      t(s"composed x$m") {
        val perDoc = pipePerDoc(docs)
        mat(pipeTail(perDoc, pipePairs(perDoc)))
      }
      sweep()
    }
    spark.stop()
  }
}
