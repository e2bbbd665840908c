package graft.plans

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.util.QueryExecutionListener

import graft.operators.RankPins

/** Query-completion sweep for [[GlobalRankRewrite]]'s lazily-persisted
  * boundary frames — see [[graft.operators.RankPins]] for the full
  * lifecycle story. Attached once per session by
  * `GraftExtensions.register`; fires on both success and failure (a
  * failed rank query must not strand its frame either). The per-query
  * cost is one `collect` over the already-computed optimized logical
  * plan — queries without in-memory relations pay a plan walk and
  * nothing else. */
class RankPinRelease extends QueryExecutionListener {
  // optimizedPlan is a lazy val: on a query that failed during
  // analysis/optimization it RE-THROWS the original error — a listener
  // must swallow that (the failed query pinned nothing anyway)
  private def releaseOf(qe: QueryExecution): Unit =
    try RankPins.release(Shims.inMemoryCacheBuilders(qe))
    catch { case scala.util.control.NonFatal(_) => () }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = releaseOf(qe)

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = releaseOf(qe)
}
