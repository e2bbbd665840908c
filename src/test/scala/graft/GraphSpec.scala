package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Known-answer micro-graphs for the iterative algorithms (FIXTURES.md
  * §A5): 3-cycle PageRank = 1/3 each, path-graph betweenness center,
  * two-component CC, identical-neighbor Jaccard = 1.0. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toSeq.toDF("src", "dst")

  test("PageRank on a 3-cycle converges to 1/3 each") {
    val pr = Graph.pageRank(edges(1L -> 2L, 2L -> 3L, 3L -> 1L), iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 3)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
  }

  test("PageRank ranks the hub of a star highest") {
    // spokes 2..5 all point at 1
    val pr = Graph.pageRank(edges(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L), 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) > pr(2L) * 3)
  }

  test("connectedComponents separates two components, min label wins") {
    val cc = Graph.connectedComponents(
      edges(1L -> 2L, 2L -> 3L, 10L -> 11L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
  }

  test("kHopReach computes 2-hop closure on a path") {
    val r = Graph.kHopReach(edges(1L -> 2L, 2L -> 3L, 3L -> 4L), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r == Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L)))
  }

  test("jaccardSimilarity: identical neighbor sets -> 1.0, excludes self") {
    // 1 and 2 both point at {10, 11}; 3 points at {10}.
    val j = Graph.jaccardSimilarity(
      edges(1L -> 10L, 1L -> 11L, 2L -> 10L, 2L -> 11L, 3L -> 10L), 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(math.abs(j((1L, 3L)) - 0.5) < 1e-12)
    assert(!j.contains((1L, 1L)))
  }

  test("betweenness: path-graph center carries all pairs") {
    // 1 -> 2 -> 3, plus reverse; exact Brandes from all sources.
    val b = Graph.betweennessSampled(
      edges(1L -> 2L, 2L -> 3L, 3L -> 2L, 2L -> 1L),
      Seq(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(b(2L) == 2.0) // on the only 1<->3 shortest paths, both directions
    assert(b.getOrElse(1L, 0.0) == 0.0 && b.getOrElse(3L, 0.0) == 0.0)
  }
}
