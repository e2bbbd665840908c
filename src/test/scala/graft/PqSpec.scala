package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Product quantization: codes, codebook training determinism, and the
  * ADC exactness property (when the corpus IS the codebook seed set and
  * iters=0, every corpus vector sits exactly on its centroids, so the
  * approximate ADC distance equals the true L2² — a closed-form check
  * of table lookup + fixed-order summation). */
class PqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(41)
  private val seeds = (0L until 4L).map(i =>
    (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
  private val emb = seeds.toDF("vec_id", "embedding")

  test("iters=0 codes: each seed vector codes to itself in every subspace") {
    val cents = Pq.trainCentroids(emb, m = 2, dsub = 4, ksub = 4, iters = 0)
    val c = Pq.codes(emb, cents, m = 2, dsub = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 0L until 4L; j <- 0 until 2)
      assert(c((i, j)) == i, s"vector $i sub $j coded ${c((i, j))}")
  }

  test("ADC distance equals exact L2^2 when corpus = codebook") {
    val cents = Pq.trainCentroids(emb, m = 2, dsub = 4, ksub = 4, iters = 0)
    val adc = Pq.adcTopK(emb, cents, col("vec_id") < 2, k = 3,
        m = 2, dsub = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val vecs = seeds.toMap
    for (((q, n), d) <- adc) {
      val exact = vecs(q).zip(vecs(n)).map { case (a, b) =>
        (a - b) * (a - b) }.sum
      assert(math.abs(d - exact) < 1e-12, s"($q,$n): adc $d vs exact $exact")
    }
    // every query sees all 3 non-self neighbors
    assert(adc.size == 2 * 3)
  }

  test("balancedPermutation is a bijection; high-variance dims spread across subspaces") {
    // dims 0..3 high-variance (alternating ±1), dims 4..7 constant — a
    // positional split would put ALL spread in subspace 0.
    val vecs = (0L until 8L).map(i =>
      (i, Seq.tabulate(8)(d =>
        if (d < 4) (if (i % 2 == 0) 1.0 else -1.0) else 0.5)))
      .toDF("vec_id", "embedding")
    val perm = Pq.balancedPermutation(vecs, m = 2, dim = 8)
      .collect().map(r => r.getInt(0) -> r.get(1).toString.toLong).toMap
    assert(perm.keySet == (0 until 8).toSet)
    assert(perm.values.toSet == (0L until 8L).toSet)  // bijection
    // snake deal: of the 4 high-variance dims, 2 land in each subspace
    val hiSub0 = (0 until 4).count(d => perm(d) < 4)
    assert(hiSub0 == 2)
    // permuted rows keep the same value multiset
    val p = Pq.permuted(vecs, Pq.balancedPermutation(vecs, m = 2, dim = 8))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).sorted).toMap
    assert(p(0L) == Seq(0.5, 0.5, 0.5, 0.5, 1.0, 1.0, 1.0, 1.0))
    assert(p(1L) == Seq(-1.0, -1.0, -1.0, -1.0, 0.5, 0.5, 0.5, 0.5))
  }

  test("training is deterministic and moves centroids to cluster means") {
    // two planted clusters per subspace, alternating so the PREFIX seeds
    // (vec_id 0, 1) land one per cluster: evens near -1, odds near +1
    val planted = (0L until 8L).map { i =>
      val base = if (i % 2 == 0) -1.0 else 1.0
      (i, Seq.fill(8)(base + rnd.nextDouble() * 0.01))
    }.toDF("vec_id", "embedding")
    def run() = Pq.trainCentroids(planted, m = 2, dsub = 4, ksub = 2,
        iters = 3)
      .select(col("sub"), col("centroid_id"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val a = run()
    assert(run() == a) // bit-identical across runs
    // centroid 0 (seeded at -1 cluster) stays near -1; centroid 1 near +1
    for (((_, cid), cv) <- a; x <- cv)
      assert(if (cid == 0L) x < 0 else x > 0)
  }
}
