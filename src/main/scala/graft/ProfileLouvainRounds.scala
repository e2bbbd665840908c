package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Dev-only: per-round move counts + wall for Graph.louvain on the sf0.1
  * REFERENCES graph — does the fixed 6-round budget do useful work in
  * every round, and which rounds dominate the g_louvain bench time? */
object ProfileLouvainRounds {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-louvain-rounds")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("b.l_linenumber") === col("a.l_linenumber") + 1)
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lv] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    t("edges.count") { println(s"[lv] edges: ${edges.count()}") }
    // replicate louvain's setup so each round can be timed + diffed
    val und = t("undirect") {
      val u = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().filter(col("src") =!= col("dst")).localCheckpoint(true)
      println(s"[lv] und edges: ${u.count()}")
      u
    }
    t("undirect-pinned") {
      val e = edges.localCheckpoint(true)
      val u = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().filter(col("src") =!= col("dst")).localCheckpoint(true)
      println(s"[lv] und2 edges: ${u.count()}")
      u
    }
    // time rounds 1..6 incrementally via rounds=i runs (cheap enough, and
    // exactly what the bench pays for its single rounds=6 run)
    var last: Map[Long, Long] = Map.empty
    for (i <- 1 to 6) {
      val lab = t(s"rounds=$i") {
        Graph.louvain(edges, rounds = i)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      val moved = if (last.isEmpty) -1 else lab.count { case (k, v) => last.get(k).exists(_ != v) }
      println(s"[lv] rounds=$i communities=${lab.values.toSet.size} movedVsPrev=$moved")
      last = lab
    }
    spark.stop()
  }
}
