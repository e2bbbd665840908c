package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale claims in SURVEY/COVERAGE —
  * filters reach the parquet scan, projections prune the read schema, no
  * accidental cartesian products — asserted on the actual physical plans
  * so a refactor that silently loses them fails CI, not the 100 TB run. */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("q06: dimension filter is pushed into the parquet scan") {
    val p = plan("q06_rank_nations_by_order_count")
    assert(p.contains("PushedFilters"), p)
    assert("""PushedFilters: \[[^\]]*n_name""".r.findFirstIn(p).isDefined,
      s"n_name filter not pushed:\n$p")
  }

  test("p4_length_filter: scan reads only the projected columns") {
    val p = plan("p4_length_filter")
    val read = """ReadSchema: struct<([^>]*)>""".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.trim.takeWhile(_ != ':')).toSet
    assert(cols == Set("doc_id", "text", "lang"),
      s"expected pruned read of {doc_id,text,lang}, got $cols:\n$p")
  }

  test("agg queries keep whole-stage codegen on the hot path") {
    // AQE only annotates codegen spans ("*(n) Operator") once the plan is
    // final — execute, then read the executed plan.
    val df = SparkEntry.queries("agg_lineitem_pricing")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(p).isDefined, p)
  }

  test("asofJoin plans exactly one key shuffle (the carry-forward window)") {
    val p = SparkEntry.queries("evt_asof_purchase")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val keyExchanges = "hashpartitioning\\(_k".r.findAllIn(p).length
    assert(keyExchanges == 1, s"expected ONE _k exchange, got $keyExchanges:\n$p")
  }

  test("no accidental cartesian products in shuffle-heavy pipelines") {
    for (name <- Seq("dd_exact_dedup", "dd_minhash_lsh_neardup",
        "q01_rank_customers_by_order_count", "q05_rank_orders_by_price",
        "evt_sessionize", "g_pattern_scan")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"cartesian in $name:\n$p")
    }
  }

  test("bm25 top-k plans TakeOrderedAndProject, never a global sort") {
    val p = plan("txt_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("decon_semantic broadcasts the quarantine side only") {
    // the corpus × quarantine pairing must be a broadcast nested loop of
    // the SMALL side — a shuffled cross of the corpus would be the
    // scale-killer this operator exists to avoid
    val p = plan("decon_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
