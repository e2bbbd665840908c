package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins a large-scale event/training-data pipeline needs and
  * plain equi-join SQL can't express efficiently: as-of (nearest key at or
  * before a time) and range (point-in-interval) joins.
  *
  * Both are built to ONE-shuffle plans:
  *  - [[asofJoin]] unions both sides and carries the latest right-side
  *    value forward inside a per-key window — the classic distributed
  *    as-of (one shuffle on the key, no join explosion, no per-row probe).
  *    A sort-merge inequality join would re-scan the right side per left
  *    row; a naive approach broadcasts one side (unbounded).
  *  - [[rangeJoinBinned]] converts the inequality predicate into an
  *    equi-join on time bins: each interval is exploded onto the bins it
  *    covers, each point keyed by its single bin, so the join shuffles on
  *    bin instead of planning a cartesian/BNL join. Exactness is restored
  *    by the residual containment filter; a point matches an interval in
  *    exactly one bin (its own), so no dedup is needed.
  *
  * Scale notes: both shuffle on (key | bin) — hot keys / clustered
  * intervals salt the usual way; bin width trades replication factor
  * (interval span ÷ bin) against bin-partition size.
  */
object TemporalJoins {

  /** Backward as-of join: every `left` row picks the `right` row with the
    * greatest `time` ≤ its own, per `key` (NULLs when none). `right` must
    * be unique per (key, time) — pre-aggregate ties first, or the carried
    * value is undefined. Returns all `left` columns plus `valueCols` from
    * the matched right row.
    *
    * DuckDB twin: native `ASOF LEFT JOIN` (`ON l.key = r.key AND
    * r.time <= l.time`) — used verbatim by the oracle entries. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      valueCols: Seq[String]): DataFrame = {
    val rv = struct(valueCols.map(col): _*)
    val rvType = right.select(rv.as("_rv")).schema.head.dataType
    val lrow = struct(left.columns.map(col).toIndexedSeq: _*)
    val lrowType = left.select(lrow.as("_lrow")).schema.head.dataType
    // tag orders right (0) before left (1) at equal timestamps, so a right
    // row AT the left row's time is visible to it — the `<=` contract.
    // NULL-key/time right rows are dropped up front: SQL join equality
    // never matches NULL, but partitionBy groups NULLs together and would
    // otherwise carry such a row onto NULL-key left rows.
    val r = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(col(key).as("_k"), col(time).as("_t"),
        rv.as("_rv"), lit(null).cast(lrowType).as("_lrow"), lit(0).as("_tag"))
    val l = left.select(col(key).as("_k"), col(time).as("_t"),
      lit(null).cast(rvType).as("_rv"), lrow.as("_lrow"), lit(1).as("_tag"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_carried", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(left.columns.map(c => col(s"_lrow.$c").as(c)) ++
        valueCols.map(c => col(s"_carried.$c").as(c)): _*)
  }

  /** Binned range join: pairs of (interval row, point row) where
    * `w_start ≤ point.time < w_end`. `windows` must carry `w_start` /
    * `w_end` timestamp columns; intervals are exploded onto
    * `binSeconds`-wide bins, points keyed by their single bin, equi-join
    * on bin, exact containment as a residual filter. Returns all columns
    * of both inputs (names must be disjoint). */
  def rangeJoinBinned(windows: DataFrame, points: DataFrame, timeCol: String,
      binSeconds: Long): DataFrame = {
    val wb = windows.withColumn("_bin", explode(sequence(
      expr(s"unix_timestamp(w_start) DIV $binSeconds"),
      expr(s"unix_timestamp(w_end) DIV $binSeconds"))))
    val pb = points.withColumn("_bin",
      expr(s"unix_timestamp($timeCol) DIV $binSeconds"))
    wb.join(pb, Seq("_bin"))
      .filter(col(timeCol) >= col("w_start") && col(timeCol) < col("w_end"))
      .drop("_bin")
  }

  /** Funnel analysis — per user, the earliest strictly-ordered
    * completion of each stage: `t1 = min ts(stage₁)`, `t_{i+1} = min
    * ts(stage_{i+1}) with ts > t_i`, and `stage` = how far the user got.
    * The product-analytics staple (view → click → purchase conversion).
    *
    * One user-keyed aggregation per stage — stage count is a constant,
    * so the plan is a fixed chain of groupBy/left-join pairs, each
    * shuffled on user_id (co-partitioned after the first exchange).
    * Timestamps surface as epoch seconds (`t{i}_s`) so the hash compare
    * never sees timestamp formatting. A user who stalls at stage i has
    * NULL for every later t (the strict `ts > NULL` predicate is
    * null-false in both engines). */
  def funnel(events: DataFrame, user: Column, ts: Column, etype: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    var cur = events.filter(etype === stages.head)
      .groupBy(user.as("user_id")).agg(min(ts).as("t1"))
    for (i <- 1 until stages.size) {
      val ev = events.filter(etype === stages(i))
        .select(user.as("u2"), ts.as("ts2"))
      val keys = col("user_id") +: (1 to i).map(j => col(s"t$j"))
      cur = cur.join(ev,
          col("user_id") === col("u2") && col("ts2") > col(s"t$i"), "left")
        .groupBy(keys: _*)
        .agg(min(col("ts2")).as(s"t${i + 1}"))
    }
    val stageExpr = (2 to stages.size)
      .map(j => when(col(s"t$j").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    cur.select(col("user_id") +:
      (1 to stages.size).map(j =>
        unix_timestamp(col(s"t$j")).as(s"t${j}_s")) :+
      stageExpr.as("stage"): _*)
  }

  /** DuckDB twin of [[funnel]] over `events(user_id, ts, event_type)`. */
  def funnelSql(table: String, stages: Seq[String]): String = {
    val s1 =
      s"""fs1 AS (SELECT user_id, MIN(ts) AS t1 FROM $table
         |  WHERE event_type = '${stages.head}' GROUP BY user_id)""".stripMargin
    val steps = (1 until stages.size).map { i =>
      val prevCols = (1 to i).map(j => s"p.t$j").mkString(", ")
      s"""fs${i + 1} AS (SELECT p.user_id, $prevCols, MIN(e.ts) AS t${i + 1}
         |  FROM fs$i p LEFT JOIN $table e
         |    ON e.user_id = p.user_id AND e.event_type = '${stages(i)}'
         |   AND e.ts > p.t$i
         |  GROUP BY p.user_id, $prevCols)""".stripMargin
    }
    val tCols = (1 to stages.size)
      .map(j => s"CAST(floor(epoch(t$j)) AS BIGINT) AS t${j}_s").mkString(",\n       ")
    val stageSum = (2 to stages.size)
      .map(j => s"CASE WHEN t$j IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $s1,
       |${steps.mkString(",\n")}
       |SELECT user_id,
       |       $tCols,
       |       1 + $stageSum AS stage
       |FROM fs${stages.size}""".stripMargin
  }
}
