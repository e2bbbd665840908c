package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** Known-answer fixtures for the temporal joins: as-of picks the latest
  * right row at-or-before, per key; binned range join equals the naive
  * inequality join. */
class TemporalJoinsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin: latest at-or-before per key, NULL when none") {
    val left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(205)), (3L, 20L, ts(50)))
      .toDF("event_id", "user_id", "t")
    val right = Seq((10L, ts(100), "a"), (10L, ts(200), "b"), (20L, ts(60), "c"))
      .toDF("user_id", "t", "v")
    val got = TemporalJoins.asofJoin(left, right, "user_id", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got == Map(
      1L -> Some("a"),  // equal timestamp IS visible (<= contract)
      2L -> Some("b"),  // latest of the two earlier purchases
      3L -> None))      // right row at t=60 is after t=50
  }

  test("asofJoin: NULL-key right rows never match (SQL join semantics)") {
    val left = Seq((1L, Option.empty[java.lang.Long], ts(100)))
      .toDF("event_id", "user_id", "t")
    val right = Seq((Option.empty[java.lang.Long], ts(50), "ghost"))
      .toDF("user_id", "t", "v")
    val got = TemporalJoins.asofJoin(left, right, "user_id", "t", Seq("v"))
      .collect()
    assert(got.length == 1 && got.head.isNullAt(3))
  }

  test("asofJoin keeps every left column") {
    val left = Seq((1L, 10L, ts(100), "x")).toDF("event_id", "user_id", "t", "extra")
    val right = Seq((10L, ts(90), 5.0)).toDF("user_id", "t", "v")
    val row = TemporalJoins.asofJoin(left, right, "user_id", "t", Seq("v"))
      .collect().head
    assert(row.getString(3) == "x" && row.getDouble(4) == 5.0)
  }

  test("rangeJoinBinned equals the naive inequality join") {
    // windows deliberately straddle bin boundaries (bin = 600 s)
    val windows = Seq((1L, ts(550), ts(1150)), (2L, ts(1200), ts(1800)))
      .toDF("win_id", "w_start", "w_end")
    val points = (0 until 40).map(i => (i.toLong, ts(i * 50L)))
      .toDF("p_id", "p_t")
    val got = TemporalJoins.rangeJoinBinned(windows, points, "p_t", 600L)
      .select(col("win_id"), col("p_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = windows.join(points,
        col("p_t") >= col("w_start") && col("p_t") < col("w_end"))
      .select(col("win_id"), col("p_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
    // no duplicate pairs from multi-bin windows
    val all = TemporalJoins.rangeJoinBinned(windows, points, "p_t", 600L)
      .select(col("win_id"), col("p_id")).collect()
    assert(all.length == got.size)
  }

  test("funnel: strict stage ordering — out-of-order click stalls the user") {
    import spark.implicits._
    val ev = Seq(
        (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
        (2L, 100L, "click"), (2L, 200L, "view"),   // click BEFORE view
        (3L, 100L, "view"), (3L, 200L, "purchase")) // skipped click
      .toDF("user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val f = TemporalJoins.funnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    // user 1 completes; 2's click precedes its view; 3 never clicks, so
    // its purchase cannot count (strict order through EVERY stage)
    assert(f == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }
}
