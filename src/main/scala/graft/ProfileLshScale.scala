package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only scale-stress for the LSH dedup knobs (VERDICT r6 #5): the
  * driver's sf0.01 → sf0.1 documents tables are a true 10× step from the
  * SAME generator (identical duplicate statistics), so comparing
  * candidate-pair counts across them is the empirical check of the
  * "candidates ∝ true dupes, not docs²" claim. Prints one line per SF
  * with docs, LSH band candidates, estimate-pruned survivors, verified
  * near-dup pairs, SimHash band candidates, SimHash pairs, and the walls
  * of the two full pipelines. Results recorded in BASELINE.md. */
object ProfileLshScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "graft-lsh-scale")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, dir).cache()
      val nDocs = docs.count()

      // ---- MinHash stage counts (the bench pipeline's exact knobs) ----
      val sig = Dedup.minHashSignatures(
        docs, col("doc_id"), col("text"), 8, 8).persist()
      val nCand = Dedup.lshCandidates(sig, 8).count()
      val cand = Dedup.lshCandidates(sig, 8)
      val nPruned = Dedup.estimateFilter(cand, sig, 8, 4).count()
      sig.unpersist(true)
      val (nPairs, wallMh) = t(Dedup.nearDupPairs(
        docs, col("doc_id"), col("text"), 8, 8, 0.8).count())

      // ---- SimHash band candidates (banding replicated from
      // Dedup.simHashPairs — distinct pairs before the hamming verify) --
      val fp = Dedup.simHash(docs, col("doc_id"), col("text")).persist()
      val bands = (0 until 4).map { j =>
        struct(lit(j).as("band"),
          (shiftright(col("simhash"), 8 * j) % 256).as("bk"))
      }
      val banded = fp.select(col("doc_id"), explode(array(bands: _*)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bk").as("bk"))
      val nSimCand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      fp.unpersist(true)
      val (nSimPairs, wallSh) = t(Dedup.simHashPairs(
        Dedup.simHash(docs, col("doc_id"), col("text")), maxHamming = 2).count())

      // ---- the scale knob: k=16, 4 rows/band (collision prob J⁴) ------
      val sig16 = Dedup.minHashSignatures(
        docs, col("doc_id"), col("text"), 8, 16).persist()
      val nCand16 = Dedup.lshCandidates(sig16, 16, rowsPerBand = 4).count()
      sig16.unpersist(true)
      val (nPairs16, wall16) = t(Dedup.nearDupPairs(
        docs, col("doc_id"), col("text"), 8, 16, 0.8,
        rowsPerBand = 4).count())

      // ---- SimHash scale knob: 48-bit fingerprint, 6 byte-bands -------
      val (nSim48, wall48) = t(Dedup.simHashPairs(
        Dedup.simHash(docs, col("doc_id"), col("text"), bits = 48),
        maxHamming = 2, bits = 48).count())

      println(s"[lsh-scale] $dir docs=$nDocs " +
        s"mh_cand=$nCand mh_pruned=$nPruned mh_pairs=$nPairs mh_wall=${wallMh.formatted("%.2f")}s " +
        s"mh16x4_cand=$nCand16 mh16x4_pairs=$nPairs16 mh16x4_wall=${wall16.formatted("%.2f")}s " +
        s"sh_cand=$nSimCand sh_pairs=$nSimPairs sh_wall=${wallSh.formatted("%.2f")}s " +
        s"sh48_pairs=$nSim48 sh48_wall=${wall48.formatted("%.2f")}s")
      docs.unpersist(true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
