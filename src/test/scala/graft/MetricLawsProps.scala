package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the bibliometric algorithms (the literal
  * transcription of /root/reference/dags/metrics.py that
  * BibliometricsSpec verifies the Spark window implementation against).
  * Pure-function properties — no Spark session, thousands of cases:
  * permutation invariance, bounds, and monotonicity under new citations.
  */
object MetricLawsProps extends Properties("metric-laws") {

  private def hRef(cs: Seq[Int]): Int = {
    val s = cs.sorted.reverse
    s.zipWithIndex.count { case (c, i) => c >= i + 1 }
  }

  private def gRef(cs: Seq[Int]): Int = {
    val s = cs.filter(_ > 0).sorted.reverse
    val cum = s.scanLeft(0L)(_ + _).tail
    cum.zipWithIndex.count { case (cm, i) => cm >= (i + 1L) * (i + 1L) }
  }

  private val cites = Gen.listOf(Gen.chooseNum(0, 500))

  property("permutation invariance") = forAll(cites) { cs =>
    val shuffled = scala.util.Random.shuffle(cs)
    hRef(cs) == hRef(shuffled) && gRef(cs) == gRef(shuffled)
  }

  property("0 <= h <= |papers| and h <= max citation") = forAll(cites) { cs =>
    val h = hRef(cs)
    h >= 0 && h <= cs.length && (cs.isEmpty || h <= cs.max)
  }

  property("h <= g (Egghe) on nonzero inputs") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1, 500))) { cs =>
      hRef(cs) <= gRef(cs)
    }

  property("adding a citation record never decreases h or g") =
    forAll(cites, Gen.chooseNum(0, 500)) { (cs, c) =>
      hRef(c :: cs) >= hRef(cs) && gRef(c :: cs) >= gRef(cs)
    }

  property("g bounded by sqrt(total citations) and paper count") =
    forAll(cites) { cs =>
      val g = gRef(cs)
      val total = cs.filter(_ > 0).map(_.toLong).sum
      g.toLong * g <= total && g <= cs.count(_ > 0)
    }

  property("zeros never affect g; duplicating the list doubles neither index past bounds") =
    forAll(cites) { cs =>
      gRef(cs ++ Seq(0, 0, 0)) == gRef(cs) &&
        hRef(cs ++ cs) <= 2 * math.max(hRef(cs), 1)
    }
}
