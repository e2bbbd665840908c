package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bibliometrics

/** Bibliometric aggregates vs the literal algorithms vendored in the
  * reference (`/root/reference/dags/metrics.py`), including its doctest
  * fixtures (FIXTURES.md §A6). */
class BibliometricsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** metrics.py:137-143 — h = Σ[cᵢ ≥ i] over desc-sorted, 1-based. */
  private def hRef(cs: Seq[Int]): Int = {
    val s = cs.sorted.reverse
    s.zipWithIndex.count { case (c, i) => c >= i + 1 }
  }

  /** metrics.py:91-96 — zeros dropped, cumsum desc, g = Σ[cumᵢ ≥ i²]. */
  private def gRef(cs: Seq[Int]): Int = {
    val s = cs.filter(_ > 0).sorted.reverse
    val cum = s.scanLeft(0L)(_ + _).tail
    cum.zipWithIndex.count { case (cm, i) => cm >= (i + 1L) * (i + 1L) }
  }

  private def run(groups: Map[String, Seq[Int]]): (Map[String, Int], Map[String, Int]) = {
    val rows = groups.toSeq.flatMap { case (g, cs) =>
      cs.zipWithIndex.map { case (c, i) => (g, i.toLong, c) }
    }
    val df = rows.toDF("grp0", "id", "cites")
    val h = Bibliometrics.hIndex(df, col("grp0"), col("cites"), col("id"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val g = Bibliometrics.gIndex(df, col("grp0"), col("cites"), col("id"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    (h, g)
  }

  test("scholarmetrics doctest fixture [6,10,5,46,0,2] -> h=4, g=5, e=47.75...") {
    val cs = Seq(6, 10, 5, 46, 0, 2)
    // NOTE: the vendored metrics.py DOCSTRING claims g=6, but executing the
    // vendored code yields 5 (it truncates at the number of nonzero papers;
    // Egghe's original allows g beyond it). We pin to the executable
    // semantics of the reference, not its stale docstring.
    assert(hRef(cs) == 4 && gRef(cs) == 5) // transcription sanity
    val (h, g) = run(Map("a" -> cs))
    assert(h("a") == 4)
    assert(g("a") == 5)
    val df = cs.zipWithIndex.map { case (c, i) => ("a", i.toLong, c) }
      .toDF("grp0", "id", "cites")
    val e = Bibliometrics.euclidean(df, col("grp0"), col("cites"))
      .collect().head.getDouble(1)
    assert(math.abs(e - math.sqrt(2281.0)) < 1e-12) // sqrt(6²+10²+5²+46²+2²)
  }

  test("all-zero citations -> h=1-ish per def, g=0 (zeros dropped)") {
    // h on [0,0]: sorted desc [0,0]; 0>=1 false -> h=0.
    val (h, g) = run(Map("z" -> Seq(0, 0)))
    assert(h("z") == 0)
    // gIndex drops zeros; group vanishes entirely — document that.
    assert(!g.contains("z"))
  }

  test("matches reference algorithm on 60 random groups; permutation-invariant") {
    val rnd = new scala.util.Random(42)
    val groups = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(30)
      s"g$i" -> Seq.fill(n)(rnd.nextInt(60))
    }.toMap
    val shuffled = groups.map { case (k, v) => k -> rnd.shuffle(v) }
    for (gs <- Seq(groups, shuffled)) {
      val (h, g) = run(gs)
      gs.foreach { case (k, cs) =>
        assert(h(k) == hRef(cs), s"h($k) on $cs")
        if (cs.exists(_ > 0)) assert(g(k) == gRef(cs), s"g($k) on $cs")
      }
    }
  }

  test("invariants: h <= g' and h <= sqrt(sum c) on nonzero sets") {
    val rnd = new scala.util.Random(7)
    val groups = (0 until 30).map { i =>
      s"g$i" -> (1 to (1 + rnd.nextInt(20))).map(_ => 1 + rnd.nextInt(40))
    }.toMap
    val (h, g) = run(groups)
    groups.foreach { case (k, cs) =>
      assert(h(k) <= g(k), s"h<=g for $k")
      assert(h(k) <= math.sqrt(cs.map(_.toLong).sum).ceil.toInt + 1)
    }
  }
}
