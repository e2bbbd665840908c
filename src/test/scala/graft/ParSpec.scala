package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Par

/** The driver-side job-overlap helper (guide §2.6): values come back
  * exactly as when sequential, and a failure in EITHER leg surfaces to
  * the caller (never a silently-dropped thread death). The callers'
  * value contract — overlapped legs compute the same frames as
  * sequential — is covered by the oracle rows of every query that uses
  * Par (g_pipe_communities, g_scc, g_articlerank_tightcap,
  * sim_ivf_pq_topk, sim_recall_eval, the walk family, g_hits).
  */
class ParSpec extends AnyFunSuite {

  test("both returns both legs' values") {
    assert(Par.both(1 + 1, "x" * 3) === ((2, "xxx")))
  }

  test("three returns all three legs' values") {
    assert(Par.three(1, 2L, "3") === ((1, 2L, "3")))
  }

  test("both actually overlaps the legs (second starts before first ends)") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    // leg A blocks until leg B has demonstrably started — deadlocks (and
    // times out) if both ran on one thread sequentially
    val (a, b) = Par.both(
      { assert(gate.await(30, java.util.concurrent.TimeUnit.SECONDS)); "a" },
      { gate.countDown(); "b" })
    assert((a, b) === (("a", "b")))
  }

  test("an exception in the threaded leg propagates") {
    val e = intercept[IllegalStateException] {
      Par.both(1, throw new IllegalStateException("boom"))
    }
    assert(e.getMessage === "boom")
  }

  test("an exception in the caller leg propagates after joining the thread") {
    @volatile var bRan = false
    val e = intercept[IllegalStateException] {
      Par.both({ throw new IllegalStateException("boom-a") }: Int,
        { Thread.sleep(50); bRan = true; 2 })
    }
    assert(e.getMessage === "boom-a")
    assert(bRan, "the second leg must be joined, not abandoned")
  }

  test("both legs run Spark actions concurrently and agree with sequential") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1L to 1000L).toDF("x")
    val (s1, s2) = Par.both(
      graft.plans.Pins.pin(df.selectExpr("sum(x) as s")).head.getLong(0),
      graft.plans.Pins.pin(df.selectExpr("count(x) as c")).head.getLong(0))
    assert(s1 === 500500L)
    assert(s2 === 1000L)
  }
}
