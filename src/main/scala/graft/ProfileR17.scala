package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r17 stage decomposition for the optimization round: times each stage
  * of the most expensive remaining bench entries (walk→PMI chain, the
  * text pipeline, the capped projected-rank chain) through the noop sink
  * so the next optimization targets are measured, not guessed (guide
  * §1.1). Results go to BASELINE.md / OPTIMIZATION_r17.md. Dev-only
  * main, not part of Verify/Bench. */
object ProfileR17 {
  private def time(label: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"[r17] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-r17")
    import graft.operators.Graph
    val which = args.headOption.getOrElse("all")
    // session warm-up (the bench does the same): JIT/codegen/footer
    // caches must not bill the first profiled stage
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    locally { val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("b.l_linenumber") === col("a.l_linenumber") + 1)
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct().write.mode("overwrite").format("noop").save() }

    def refEdges: DataFrame = {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("b.l_linenumber") === col("a.l_linenumber") + 1)
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
    }

    if (which == "all" || which == "walk") {
      time("refEdges")(refEdges)
      time("randomWalks(500,5)")(Graph.randomWalks(refEdges, 500L, 5))
      val walks = Graph.randomWalks(refEdges, 500L, 5)
      time("walkCooc(walks,2)")(Graph.walkCooccurrence(walks, 2))
      val cooc = Graph.walkCooccurrence(
        Graph.randomWalks(refEdges, 500L, 5), 2)
      time("pmiEmbed(cooc,5) full")(Graph.pmiEmbed(cooc, 5))
    }

    if (which == "pipefine") {
      import graft.operators.{Pii, TextAnalysis}
      val docs = Tables.documents(spark, dir)
      val clean = graft.plans.Pins.pin(Tables.fanned(docs
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0),
        col("doc_id")))
      time("scrub")(Pii.scrub(clean, col("doc_id"), col("text")))
      val scrubbed = graft.plans.Pins.pin(
        Pii.scrub(clean, col("doc_id"), col("text"))
          .select(col("doc_id"), col("scrubbed"))
          .join(clean.select(col("doc_id"), col("lang"), col("source")),
            "doc_id"))
      time("qualityScore")(TextAnalysis.qualityScore(scrubbed,
        col("doc_id"), col("scrubbed")))
      time("repetition")(TextAnalysis.repetition(scrubbed,
        col("doc_id"), col("scrubbed")))
      time("toks size")(scrubbed.withColumn("n",
        size(TextAnalysis.toks(col("scrubbed")))))
      time("3-way join assembly")({
        val quality = TextAnalysis.qualityScore(scrubbed, col("doc_id"),
          col("scrubbed")).select(col("doc_id"), col("quality_score"))
        val rep = TextAnalysis.repetition(scrubbed, col("doc_id"),
          col("scrubbed")).select(col("doc_id"), col("dup_bigram_frac"))
        scrubbed.join(quality, "doc_id").join(rep, "doc_id")
          .withColumn("n_tokens",
            size(TextAnalysis.toks(col("scrubbed"))).cast("long"))
      })
    }

    if (which == "all" || which == "pipe") {
      import graft.queries.TextPipelineQueries._
      val docs = Tables.documents(spark, dir)
      time("pipePerDoc")(pipePerDoc(docs))
      val perDoc = graft.plans.Pins.pin(pipePerDoc(docs))
      time("pipePairs(perDoc)")(pipePairs(perDoc))
      val pairs = graft.plans.Pins.pin(pipePairs(perDoc))
      time("pipeTail(perDoc,pairs)")(pipeTail(perDoc, pairs))
    }

    if (which == "all" || which == "arc") {
      val KHopCap = 1000000L
      time("kHopReach(10,cap)")(
        Graph.kHopReach(refEdges, 10, maxPairs = Some(KHopCap)))
      val closure = Graph.kHopReach(refEdges, 10, maxPairs = Some(KHopCap))
      val li = Tables.lineitem(spark, dir)
      val ends = li.join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("entity"), col("l_partkey").as("node"))
        .distinct()
      time("capAttachment(ends,8)")(Graph.capAttachment(ends, 8))
      val capped = Graph.capAttachment(ends, 8)
      time("projectViaClosure")(Graph.projectViaClosure(capped, closure))
      val proj = Graph.projectViaClosure(capped, closure)
      time("pageRankFixed(proj,10)")(Graph.pageRankFixed(proj, 10))
    }

    if (which == "khop") {
      import graft.plans.Pins.PinnedOps
      val base = refEdges.pinned
      println(s"[r17] base rows=${base.count()}")
      val f = base.select(col("src").as("f_src"), col("dst").as("f_dst"))
      def frontier2 = f.join(base, col("f_dst") === col("src"))
        .select(col("f_src").as("src"), col("dst"))
        .distinct()
        .join(base.select(col("src").as("r_src"), col("dst").as("r_dst")),
          col("src") === col("r_src") && col("dst") === col("r_dst"),
          "left_anti")
      var t0 = System.nanoTime()
      val c1 = frontier2.count()
      println(f"[r17] hop2 count NO cache: ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c1")
      t0 = System.nanoTime()
      val fc = frontier2.cache()
      val c2 = fc.count()
      println(f"[r17] hop2 count WITH cache: ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c2")
      fc.unpersist()
    }

    if (which == "arc2") {
      val KHopCap = 1000000L
      val closure = Graph.kHopReach(refEdges, 10, maxPairs = Some(KHopCap))
      val li = Tables.lineitem(spark, dir)
      val ends = li.join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("entity"), col("l_partkey").as("node"))
        .distinct()
      val capped = Graph.capAttachment(ends, 8)
      val t0 = System.nanoTime()
      val proj = graft.plans.Pins.pin(
        Graph.projectViaClosure(capped, closure))
      println(f"[r17] proj pin: ${(System.nanoTime() - t0) / 1e9}%6.2f s, " +
        s"rows=${proj.count()}")
      time("pageRankFixed(pinned proj,10)")(Graph.pageRankFixed(proj, 10))
      time("pageRankFixed(pinned proj,10) again")(
        Graph.pageRankFixed(proj, 10))
    }

    if (which == "all" || which == "hits") {
      time("hitsFixed(e,20)")(Graph.hitsFixed(refEdges, 20))
      time("louvain(e,6)")(Graph.louvain(refEdges, 6))
      time("pageRankWeighted(10)")({
        val li = Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        val we = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
            col("b.l_linenumber") === col("a.l_linenumber") + 1)
          .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        Graph.pageRankWeightedFixed(we, 10)
      })
    }
    spark.stop()
  }
}
