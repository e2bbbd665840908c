package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, Similarity}

/** IVF×PQ composition ([[Pq.ivfAdcTopK]]): ADC distances must equal the
  * full-scan ADC path pair-for-pair, candidates must come only from
  * probed buckets, and ranks must be dense and distance-ordered. */
class IvfPqSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val (m, dsub, ksub) = (4, 16, 8)

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val ivfC = Similarity.kMeansCentroids(emb, 8, iters = 1)
  private lazy val pqC = Pq.trainCentroids(emb, m, dsub, ksub, iters = 1)
  private lazy val isQ = col("vec_id") < 10

  private lazy val got = Pq.ivfAdcTopK(emb, ivfC, pqC, isQ, k = 5,
    m, dsub, nProbe = 2).collect()

  test("adist values match the full-scan ADC path pair-for-pair") {
    // adcTopK with k = |corpus| is the exhaustive ADC ranking — every
    // (query, neighbor) the IVF path returns must carry the same adist
    val n = emb.count().toInt
    val full = Pq.adcTopK(emb, pqC, isQ, k = n, m, dsub)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(full.contains(key), s"pair $key missing from full ADC scan")
      assert(full(key) == r.getDouble(3),
        s"adist drift at $key: ${full(key)} vs ${r.getDouble(3)}")
    }
  }

  test("neighbors come only from the query's probed buckets") {
    val e0 = emb.select(col("vec_id"),
      Similarity.vecD(col("embedding")).as("v"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("centroid_id"))
    val scored = e0.crossJoin(broadcast(
        ivfC.select(col("centroid_id"), col("cv"))))
      .withColumn("cos", Similarity.cosine(col("v"), col("cv")))
      .withColumn("rnk", row_number().over(w))
    val bucketOf = scored.filter(col("rnk") === 1)
      .select(col("vec_id"), col("centroid_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probesOf = scored.filter(isQ && col("rnk") <= 2)
      .select(col("vec_id"), col("centroid_id").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    got.foreach { r =>
      val (q, nb) = (r.getLong(0), r.getLong(1))
      assert(probesOf(q).contains(bucketOf(nb)),
        s"neighbor $nb of query $q is outside its probed buckets")
    }
  }

  test("ranks are dense, start at 1, and follow (adist asc, vec_id)") {
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length).toSeq)
      val byDist = sorted.map(r => (r.getDouble(3), r.getLong(1))).toSeq
      assert(byDist == byDist.sorted)
    }
  }
}
