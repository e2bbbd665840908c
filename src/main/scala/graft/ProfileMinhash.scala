package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level wall-time breakdown of the MinHash+LSH near-dup pipeline
  * (`dd_minhash_lsh_neardup`, the single most expensive bench query).
  * Replicates [[Dedup.nearDupPairs]]'s exact stage structure with a timed
  * materialization per stage so the dominant cost is attributable:
  *   sig    — shingle + md5 + k minima (narrow, shuffle-free)
  *   band   — LSH band self-join (first exchange)
  *   prune  — signature-agreement estimate filter over candidates
  *   verify — exact-Jaccard on shingle arrays of candidate docs
  * Run: sbt "runMain graft.ProfileMinhash" (SPARK_GRAFT_SF_DIR selects SF).
  */
object ProfileMinhash {
  private val shingleN = 8
  private val k = 8
  private val threshold = 0.8

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-profile-minhash")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // file-listing + footer warm-up

    def timed(label: String)(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label%-28s $dt%8.2fs")
      dt
    }

    (1 to 2).foreach { round =>
      println(s"[profile] --- round $round (round 1 is warm-up) ---")
      val sig = Dedup.minHashSignatures(docs, col("doc_id"), col("text"),
        shingleN, k).persist()
      timed("sig (shingle+md5+minima)")(sig)
      val cand = Dedup.lshCandidates(sig, k)
      timed("band self-join (cand)")(cand)
      val pruned = Dedup.estimateFilter(cand, sig, k, k / 2).persist()
      timed("estimate prune (pruned)")(pruned)
      val candDocs = pruned.select(col("doc_a").as("doc_id"))
        .union(pruned.select(col("doc_b"))).distinct()
      val docArr = docs.select(col("doc_id"), lower(col("text")).as("lt"))
        .join(candDocs, "doc_id")
        .select(col("doc_id"),
          graft.functions.TextFns.shingles(col("lt"), shingleN).as("arr"))
        .withColumn("n", size(col("arr")))
        .persist()
      timed("candidate shingle arrays")(docArr)
      val verified = pruned
        .join(docArr.select(col("doc_id").as("doc_a"),
          col("arr").as("arr_a"), col("n").as("n_a")), "doc_a")
        .join(docArr.select(col("doc_id").as("doc_b"),
          col("arr").as("arr_b"), col("n").as("n_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("arr_a"), col("arr_b"))) * lit(1.0) /
            (col("n_a") + col("n_b") -
              size(array_intersect(col("arr_a"), col("arr_b"))))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .orderBy(col("doc_a"), col("doc_b"))
      timed("verify (exact jaccard)")(verified)
      val t0 = System.nanoTime()
      val full = Dedup.nearDupPairs(docs, col("doc_id"), col("text"),
        shingleN, k, threshold)
      full.write.mode("overwrite").format("noop").save()
      println(f"[profile] ${"FULL nearDupPairs"}%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs (pairs=${full.count()})")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
