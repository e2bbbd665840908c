package graft

/** Developer tool: dump formatted physical plans for the headline queries
  * and flag plan smells — full-column scans, missing pushed filters,
  * non-broadcast dimension joins. Run:
  * `sbt "runMain graft.PlanAudit /root/testdata/sf0.01 /tmp/plans"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-plan")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    // SPARK_GRAFT_AUDIT: comma-separated query names to audit instead of
    // the bench headline set (dev-only, like Verify's SPARK_GRAFT_ONLY)
    val names = sys.env.get("SPARK_GRAFT_AUDIT")
      .map(_.split(',').toSeq.filter(qs.contains))
      .getOrElse(Bench.headline.filter(qs.contains))
    names.foreach { name =>
      val df = qs(name)(spark, sfDir)
      df.collect() // execute THIS plan so AQE finalizes + codegen ids appear
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
      val smells = Seq(
        "SortMergeJoin" -> plan.contains("SortMergeJoin"),
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-codegen" -> !plan.contains("codegen id"))
        .collect { case (s, true) => s }
      println(f"$name%-38s ${if (smells.isEmpty) "ok" else smells.mkString(", ")}")
    }
    spark.stop()
  }
}
