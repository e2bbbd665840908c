package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's non-timing seams (VERDICT r14 #1/#2, r15 #2/#3):
  * tier membership sanity, cost-descending execution order, the
  * incremental partial-results writer that keeps a wall-clock-killed run
  * gradable, and the wall-budget governor — all exercised through
  * [[Bench.runSuite]] against a fake runner, so the seams that decide
  * whether the driver's hour suffices are tested in milliseconds, not
  * by a 50-minute bench run. Timing itself is the driver's job — these
  * tests never start Spark. */
class BenchSpec extends AnyFunSuite {
  private val om = new ObjectMapper()

  test("tiers: heavy and mid are disjoint, and every member is a real headline query") {
    assert((Bench.heavy & Bench.mid).isEmpty,
      "a query cannot be in both the heavy and mid tiers")
    val headline = Bench.headline.toSet
    assert(Bench.heavy.subsetOf(headline))
    assert(Bench.mid.subsetOf(headline),
      s"mid entries missing from headline: ${Bench.mid -- headline}")
    val registry = SparkEntry.queries.keySet
    assert(headline.subsetOf(registry),
      s"headline names not in the registry: ${headline -- registry}")
  }

  test("execution order: expensive tiers first, cheap tail last (VERDICT r15 #2)") {
    // same queries, reordered — nothing dropped or duplicated
    assert(Bench.execOrder.sorted == Bench.headline.sorted)
    // tier ranks are monotone along execOrder: every heavy entry
    // precedes every mid entry precedes every 3-run entry, so a
    // wall-clock kill strands only the cheapest numbers
    val rank = Bench.execOrder.map(n =>
      if (Bench.heavy.contains(n)) 0
      else if (Bench.mid.contains(n)) 1 else 2)
    assert(rank == rank.sorted,
      "execOrder must run heavy, then mid, then the 3-run tier")
    // and the expensive prefix is exactly the heavy+mid set
    val prefix = Bench.execOrder.take(Bench.heavy.size + Bench.mid.size)
    assert(prefix.toSet == Bench.heavy ++ Bench.mid)
    // the mid tier runs in its static cost-descending order, and that
    // order covers the mid set exactly
    assert(Bench.midOrder.toSet == Bench.mid &&
      Bench.midOrder.size == Bench.mid.size)
    assert(Bench.execOrder.slice(Bench.heavy.size,
      Bench.heavy.size + Bench.mid.size) == Bench.midOrder)
    // the 3-run tail preserves declaration order so cross-round partial
    // artifacts stay line-comparable
    val threeRun = Bench.execOrder.filterNot(n =>
      Bench.heavy.contains(n) || Bench.mid.contains(n))
    assert(threeRun == Bench.headline.filterNot(n =>
      Bench.heavy.contains(n) || Bench.mid.contains(n)))
  }

  test("partial lines: one self-contained JSON object per completed query, durable appends") {
    val tel = Bench.QueryTel(min = 1.25, max = 2.5, gcMs = 42,
      stealPct = Some(0.123), retried = true)
    val l1 = Bench.partialLine("q1", Some(1.25), None, Some(tel))
    val l2 = Bench.partialLine("q2", None,
      Some("java.lang.RuntimeException: \"quoted\"\nsecond line"), None)

    val j1 = om.readTree(l1)
    assert(j1.get("query").asText == "q1")
    assert(j1.get("value").asDouble == 1.25)
    assert(j1.get("err").isNull)
    val t1 = j1.get("telemetry")
    assert(t1.get("min").asDouble == 1.25 && t1.get("max").asDouble == 2.5)
    assert(t1.get("spread").asDouble == 2.0 && !t1.get("noisy").asBoolean)
    assert(t1.get("gc_ms").asLong == 42)
    assert(t1.get("steal_pct").asDouble == 0.123)
    assert(t1.get("retried").asBoolean)
    assert(!t1.has("heavy") && !t1.has("mid") && !t1.has("degraded"))

    // a failed query: null value, the (escaped) error, no telemetry —
    // the newline in the message must NOT break the one-line framing
    assert(!l2.contains("\n"))
    val j2 = om.readTree(l2)
    assert(j2.get("value").isNull && j2.get("telemetry").isNull)
    assert(j2.get("err").asText.contains("\"quoted\""))

    // tier + governor markers ride the telemetry exactly like the final
    // JSON's
    val midLine = Bench.partialLine(Bench.mid.head, Some(3.0), None,
      Some(Bench.QueryTel(3.0, 3.0, 0, None)))
    assert(om.readTree(midLine).get("telemetry").get("mid").asBoolean)
    val degLine = Bench.partialLine("q3", Some(3.0), None,
      Some(Bench.QueryTel(3.0, 3.0, 0, None, degraded = true)))
    assert(om.readTree(degLine).get("telemetry").get("degraded").asBoolean)

    // appendLine: open-append-close per line — every line on disk is
    // complete after each call (the kill -9 guarantee), and a re-run's
    // lines stack under the previous ones until the caller truncates
    val f = Files.createTempDirectory("bench-partial")
      .resolve("BENCH_partial.jsonl").toString
    Bench.appendLine(f, l1)
    assert(Files.readAllLines(Paths.get(f)).size == 1)
    Bench.appendLine(f, l2)
    Bench.appendLine(f, midLine)
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(Files.readAllLines(Paths.get(f))).asScala
    assert(lines.size == 3)
    lines.foreach(l => assert(om.readTree(l).has("query")))
  }

  /** A deterministic fake runner: every call to `runOnce` advances a
    * virtual clock by the entry's scripted duration, so runSuite's
    * protocol decisions (runs per tier, GC gate, governor threshold)
    * are observable from the call log and the clock. */
  private final class FakeBench(durS: Map[String, Double],
      defaultS: Double = 0.1) {
    var clock = 0.0
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val gcs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val flushed = scala.collection.mutable.ArrayBuffer.empty[String]
    def runOnce(name: String): (Double, Long, Option[String]) = {
      val d = durS.getOrElse(name, defaultS)
      clock += d
      calls += name
      (d, 7L, None)
    }
    def run(names: Seq[String], budgetS: Double,
        steal: () => Option[Bench.CpuSnap] = () => None): Seq[Bench.EntryResult] =
      Bench.runSuite(names, runOnce, steal, () => gcs += clock,
        () => clock, budgetS, flushed += _)
  }

  test("runSuite: per-tier run counts — mid 2, three_run 3, plus one warm-up each") {
    val midQ = Bench.mid.head
    val smallQ = "agg_lineitem_pricing"
    val fb = new FakeBench(Map(midQ -> 2.0, smallQ -> 0.2))
    val rs = fb.run(Seq(midQ, smallQ), budgetS = 1e9)
    assert(fb.calls.count(_ == midQ) == 3, "mid = warm-up + 2 timed")
    assert(fb.calls.count(_ == smallQ) == 4, "three_run = warm-up + 3 timed")
    val mid = rs.find(_.name == midQ).get
    assert(mid.tier == "mid" && mid.value.contains(2.0))
    assert(mid.tel.get.gcMs == 7L, "mid reports the kept run's own gc")
    val small = rs.find(_.name == smallQ).get
    assert(small.tier == "three_run" && small.value.contains(0.2))
    assert(small.tel.get.gcMs == 21L, "three_run sums its 3 timed runs' gc")
    // every completed entry flushed one parseable partial line, in order
    assert(fb.flushed.size == 2)
    assert(om.readTree(fb.flushed.head).get("query").asText == midQ)
  }

  test("runSuite: GC gate — >1s warm-ups GC, sub-second stretches GC every N (VERDICT r15 #1)") {
    val midQ = Bench.mid.head
    val names = midQ +: (1 to (Bench.GcEveryN * 2)).map(i => s"tiny_$i")
    val fb = new FakeBench(Map(midQ -> 3.0), defaultS = 0.01)
    val rs = fb.run(names, budgetS = 1e9)
    // the >1s entry GCs; the first tiny entry after it does NOT (counter
    // just reset); the counter then forces one GC per GcEveryN tinies
    assert(rs.head.gcForced, "a >1s warm-up must trigger the gated GC")
    assert(!rs(1).gcForced, "a sub-second entry right after a GC must not")
    assert(rs.count(_.gcForced) == 1 + 2,
      s"expected 1 gated + 2 counter GCs, got ${rs.count(_.gcForced)}")
    assert(fb.gcs.size == rs.count(_.gcForced))
  }

  test("runSuite: wall-budget governor degrades instead of dying (VERDICT r15 #3)") {
    // budget 10s, entries 1.2s each: the governor trips once elapsed
    // crosses 8s and every later entry runs ONE cold timed run (no
    // warm-up) with the degraded flag — ALL entries still complete and
    // flush
    val names = (1 to 12).map(i => s"q_$i")
    val fb = new FakeBench(Map.empty, defaultS = 1.2)
    val rs = fb.run(names, budgetS = 10.0)
    assert(rs.size == names.size, "the governor must never drop entries")
    assert(fb.flushed.size == names.size)
    val degraded = rs.filter(_.tel.exists(_.degraded))
    assert(degraded.nonEmpty, "a 14s+ suite under a 10s budget must degrade")
    // degradation is a suffix: once tripped, every later entry degrades
    val flags = rs.map(_.tel.exists(_.degraded))
    assert(flags.zip(flags.tail).forall { case (a, b) => !a || b },
      "once degraded, always degraded")
    // a degraded three_run entry ran ONE cold run instead of warm-up + 3
    // (ADVICE r16: the warm-up is skipped too, halving post-governor cost)
    val firstDeg = degraded.head.name
    assert(fb.calls.count(_ == firstDeg) == 1,
      "degraded = ONE cold timed run, no warm-up")
    // its partial line carries the marker for the salvage reader
    val degLine = fb.flushed(rs.indexWhere(_.name == firstDeg))
    assert(om.readTree(degLine).get("telemetry").get("degraded").asBoolean)
    // and the pre-threshold prefix kept the full protocol
    assert(fb.calls.count(_ == names.head) == 4)
  }

  test("runSuite: steal-gated retry keeps the min and respects the mid budget") {
    // a fake /proc/stat where the hypervisor steals 10% continuously:
    // every mid entry trips the gate until the budget runs out
    val midQs = Bench.mid.take(Bench.MidRetryBudget + 2).toSeq
    var tick = 0L
    def windyCpu(): Option[Bench.CpuSnap] = {
      tick += 1000
      Some(Bench.CpuSnap(total = tick * 10, steal = tick, idle = 0))
    }
    val fb = new FakeBench(Map.empty, defaultS = 1.0)
    val rs = fb.run(midQs, budgetS = 1e9, steal = () => windyCpu())
    val retried = rs.filter(_.tel.exists(_.retried))
    assert(retried.size == Bench.MidRetryBudget,
      s"sustained wind must cap mid retries at ${Bench.MidRetryBudget}")
    // a retried mid entry ran warm-up + 2 + 1 retry
    assert(fb.calls.count(_ == retried.head.name) == 4)
    // past the budget: no retry, warm-up + 2 only
    val unretried = rs.filterNot(_.tel.exists(_.retried))
    assert(unretried.nonEmpty &&
      fb.calls.count(_ == unretried.head.name) == 3)
  }
}
