package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def embDf(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("quantize: hand-computed int8 codes, exact norm, zero-vector safe") {
    val e = embDf(Seq(0L -> Seq(1f, 0.5f, -1f), 1L -> Seq(0f, 0f, 0f)))
    val q = Similarity.quantize(e).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Long](2), r.getLong(3)))).toMap
    // s = 1; codes = floor(x*127 + 0.5): 127, 64 (63.5+0.5), -127
    assert(q(0L) == ((1.0, Seq(127L, 64L, -127L), 127L * 127 + 64L * 64 + 127L * 127)))
    assert(q(1L) == ((0.0, Seq(0L, 0L, 0L), 0L)))
  }

  test("quantizedTopK ranks like the exact cosine on well-separated vectors") {
    val e = embDf(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f), 3L -> Seq(-1f, 0f)))
    val top = Similarity.quantizedTopK(e, col("vec_id") === 0, 2).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    // quantization error bound: |cos_q - cos| <= ~2*sqrt(d)/127 for unit-ish
    // vectors; on this fixture the top-1 score stays within 0.02
    val cosQ = top.head.getDouble(4)
    val exact = Similarity.bruteForceTopK(e, col("vec_id") === 0, 1)
      .collect().head.getDouble(3)
    assert(math.abs(cosQ - exact) < 0.02, s"cos_q=$cosQ exact=$exact")
  }

  test("bruteForceTopK finds the exact nearest neighbor on a known set") {
    // 2-d vectors: 0 and 1 nearly parallel; 2 orthogonal.
    val e = embDf(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f), 3L -> Seq(-1f, 0f)))
    val top = Similarity.bruteForceTopK(e, col("vec_id") === 0, 2).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(top.head.getDouble(3) > 0.99)
  }

  test("ivfTopK returns a subset of brute-force results (same bucket)") {
    val rnd = new scala.util.Random(3)
    val vs = (0L until 100L).map { i =>
      i -> Seq.fill(16)(rnd.nextFloat() - 0.5f)
    }
    val e = embDf(vs)
    val bf = Similarity.bruteForceTopK(e, col("vec_id") < 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, col("vec_id") < 5, 4, 3).collect()
    // IVF prunes to one bucket: every hit must be a genuine neighbor pair
    // ranked by the same cosine — so each (query, neighbor) with rank 1
    // in IVF must appear in the brute-force top-10 *if* they share a
    // bucket. Weak but real property: no fabricated neighbors.
    val pairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    // sanity: rnk contiguous from 1 per query
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
    }
    // At least half the IVF picks should coincide with global top-10 —
    // with 4 centroids over random data the bucket holds the near field.
    assert(pairs.count(bf.contains) * 2 >= pairs.size)
  }

  test("multi-probe IVF recall dominates single-probe") {
    val rnd = new scala.util.Random(21)
    val e = embDf((0L until 150L).map { i =>
      i -> Seq.fill(12)(rnd.nextFloat() - 0.5f)
    })
    val bf = Similarity.bruteForceTopK(e, col("vec_id") < 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbe: Int): Double = {
      val got = Similarity.ivfTopK(e, col("vec_id") < 10, 6, 3, nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.count(bf.contains).toDouble / bf.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    val r6 = recall(6) // probing all buckets == brute force
    assert(r3 >= r1)
    assert(math.abs(r6 - 1.0) < 1e-9)
  }

  test("kMeansCentroids recovers two planted clusters") {
    // Two tight clusters around orthogonal anchors; seeds 0 and 1 land one
    // in each, so Lloyd's must pull each centroid to its cluster mean.
    val rnd = new scala.util.Random(7)
    val vs = (0L until 60L).map { i =>
      val anchor = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f) else Seq(0f, 1f, 0f, 0f)
      i -> anchor.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    }
    val cents = Similarity.kMeansCentroids(embDf(vs), 2, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents.size == 2)
    assert(cents(0L).head > 0.8 && cents(0L)(1) < 0.2)   // near (1,0,…)
    assert(cents(1L).head < 0.2 && cents(1L)(1) > 0.8)   // near (0,1,…)
    // assignment against trained centroids separates the clusters exactly
    val assign = Similarity.ivfAssignWith(embDf(vs),
        Similarity.kMeansCentroids(embDf(vs), 2, 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 60L).forall(i => assign(i) == i % 2))
  }

  test("kMeansCentroids is deterministic across runs") {
    val rnd = new scala.util.Random(13)
    val e = embDf((0L until 50L).map(i => i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    def run() = Similarity.kMeansCentroids(e, 4, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run() == run())
  }

  test("lshNearPairs agrees with exactNearPairs on found pairs") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(8)(rnd.nextFloat() - 0.5f)
    val vs = (0L until 40L).map { i =>
      if (i % 10 == 0) i -> base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
      else i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)
    }
    val e = embDf(vs)
    val exact = Similarity.exactNearPairs(e, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearPairs(e, 6, 8, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)              // the planted clones
    assert(lsh.subsetOf(exact))         // LSH never fabricates pairs
    assert(lsh.nonEmpty)                // planted clones collide in buckets
  }

  test("semDedup drops higher-id within-cluster near-dups, keeps the rest") {
    val e = embDf(Seq(
      0L -> Seq(1f, 0.01f, 0f, 0f),     // cluster 0, survivor
      1L -> Seq(0.99f, 0.012f, 0f, 0f), // cluster 0, ~dup of 0 -> dropped
      2L -> Seq(0f, 1f, 0f, 0f),        // cluster 1, survivor
      3L -> Seq(0.01f, 0.99f, 0f, 0f),  // cluster 1, ~dup of 2 -> dropped
      4L -> Seq(0.6f, 0.8f, 0f, 0f)))   // cluster 1, cos(v4,v2)=0.8 < t
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("centroid_id", "cv")
    val out = Similarity.semDedup(e, cents, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 2L -> 1L, 4L -> 1L))
  }
}
