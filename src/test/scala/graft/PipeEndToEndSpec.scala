package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPipelineQueries

/** Smoke + invariants for the composed training-data pipeline
  * (`pipe_end_to_end`): the stage chain must actually drop rows at its
  * gates and produce a consistent packed stream. Value-level correctness
  * is the driver's DuckDB hash check of the twin. */
class PipeEndToEndSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    TextPipelineQueries.queries("pipe_end_to_end")(spark, dir).collect()

  test("pipeline yields a non-trivial, strictly filtered corpus") {
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.nonEmpty)
    // gates actually dropped something (dedup clusters, quality,
    // quarantine window, mixing all bite on this corpus)
    assert(rows.length < nDocs, s"no stage dropped anything (${rows.length})")
    // quarantine window excluded outright
    assert(rows.forall(_.getLong(0) >= 25))
  }

  test("packed stream offsets are the running sum in doc_id order") {
    val sorted = rows.sortBy(_.getLong(0))
    var acc = 0L
    sorted.foreach { r =>
      assert(r.getLong(3) == acc,
        s"doc ${r.getLong(0)}: offset ${r.getLong(3)} != running sum $acc")
      assert(r.getLong(4) == acc / 2048L) // seq_id = offset DIV budget
      acc += r.getLong(2)
    }
  }
}
