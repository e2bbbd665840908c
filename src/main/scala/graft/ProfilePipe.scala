package graft
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pii, TextAnalysis}
object ProfilePipe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "prof-pipe")
    val dir = "/root/testdata/sf0.1"
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[pp] $l%-22s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    def mat(df: org.apache.spark.sql.DataFrame): Long = { df.write.mode("overwrite").format("noop").save(); 0L }
    // warm-up
    val q = graft.queries.TextPipelineQueries.queries("pipe_end_to_end")
    mat(q(spark, dir))
    spark.catalog.clearCache(); spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val docs = Tables.documents(spark, dir)
    val clean = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
    val scrubbed = Pii.scrub(clean, col("doc_id"), col("text"))
      .select(col("doc_id"), col("scrubbed"))
      .join(clean.select(col("doc_id"), col("lang"), col("source")), "doc_id")
    t("scrubbed")(mat(scrubbed))
    val pairs = Dedup.nearDupPairs(scrubbed, col("doc_id"), col("scrubbed"), 8, 8, 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    t("nearDupPairs")(mat(pairs))
    val drops = graft.operators.Graph.connectedComponents(pairs, maxIters = 50)
      .filter(col("id") =!= col("component")).select(col("id").as("doc_id"))
    t("CC drops")(mat(drops))
    val deduped = scrubbed.join(drops, Seq("doc_id"), "left_anti")
    val quality = TextAnalysis.qualityScore(deduped, col("doc_id"), col("scrubbed")).select(col("doc_id"), col("quality_score"))
    val rep = TextAnalysis.repetition(deduped, col("doc_id"), col("scrubbed")).select(col("doc_id"), col("dup_bigram_frac"))
    val gated = deduped.join(quality, "doc_id").join(rep, "doc_id")
      .filter(col("quality_score") >= 0.5 && (col("dup_bigram_frac").isNull || col("dup_bigram_frac") <= 0.5))
      .select(col("doc_id"), col("scrubbed"), col("lang"))
    t("gated")(mat(gated))
    val corpusSide = gated.filter(col("doc_id") >= 25)
    val flaggedIds = graft.operators.Decontaminate.flagged(
        corpusSide, col("doc_id"), col("scrubbed"),
        scrubbed.filter(col("doc_id") < 25), col("doc_id"), col("scrubbed"), n = 30)
      .select(col("doc_id"))
    t("decon flagged")(mat(flaggedIds))
    spark.stop()
  }
}
