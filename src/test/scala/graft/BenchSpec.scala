package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's non-timing seams (VERDICT r14 #1/#2): tier
  * membership sanity and the incremental partial-results writer that
  * keeps a wall-clock-killed run gradable. Timing itself is the
  * driver's job — these tests never start Spark. */
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
    assert(!t1.has("heavy") && !t1.has("mid"))

    // a failed query: null value, the (escaped) error, no telemetry —
    // the newline in the message must NOT break the one-line framing
    assert(!l2.contains("\n"))
    val j2 = om.readTree(l2)
    assert(j2.get("value").isNull && j2.get("telemetry").isNull)
    assert(j2.get("err").asText.contains("\"quoted\""))

    // tier markers ride the telemetry exactly like the final JSON's
    val heavyLine = Bench.partialLine(Bench.heavy.head, Some(3.0), None,
      Some(Bench.QueryTel(3.0, 3.0, 0, None)))
    assert(om.readTree(heavyLine).get("telemetry").get("heavy").asBoolean)
    val midLine = Bench.partialLine(Bench.mid.head, Some(3.0), None,
      Some(Bench.QueryTel(3.0, 3.0, 0, None)))
    assert(om.readTree(midLine).get("telemetry").get("mid").asBoolean)

    // appendLine: open-append-close per line — every line on disk is
    // complete after each call (the kill -9 guarantee), and a re-run's
    // lines stack under the previous ones until the caller truncates
    val f = Files.createTempDirectory("bench-partial")
      .resolve("BENCH_partial.jsonl").toString
    Bench.appendLine(f, l1)
    assert(Files.readAllLines(Paths.get(f)).size == 1)
    Bench.appendLine(f, l2)
    Bench.appendLine(f, heavyLine)
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(Files.readAllLines(Paths.get(f))).asScala
    assert(lines.size == 3)
    lines.foreach(l => assert(om.readTree(l).has("query")))
  }
}
