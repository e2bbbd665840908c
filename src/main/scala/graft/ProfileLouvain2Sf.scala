package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Dev-only phase timer for g_louvain2 at testdata scale (round-8: the
  * first sf0.1 bench timing came in at ~36× g_louvain — this isolates
  * whether the cost is level-1, the contraction, or the level-2 rounds,
  * and how big the contracted graph actually is). */
object ProfileLouvain2Sf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      "graft-profile-louvain2-sf")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[l2sf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val edges = t("refEdges build") {
      graft.queries.GraphQueries.refEdgesPublic(spark, sfDir)
        .localCheckpoint(true)
    }
    println(s"[l2sf] edges: ${edges.count()}")
    val l1 = t("l1 louvain (6 rounds)") {
      Graph.louvain(edges, rounds = 6).localCheckpoint(true)
    }
    println(s"[l2sf] l1 nodes: ${l1.count()}, communities: " +
      l1.select(col("label")).distinct().count())
    // ---- replicate louvain2's level-2 internals with per-phase timers
    import org.apache.spark.sql.expressions.Window
    val und = t("undirect") {
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().filter(col("src") =!= col("dst")).localCheckpoint(true)
    }
    val m2 = und.count()
    val ce = t("contraction ce") {
      und.join(l1.select(col("id").as("src"), col("label").as("csrc")), "src")
        .join(l1.select(col("id").as("dst"), col("label").as("cdst")), "dst")
        .groupBy(col("csrc").as("src"), col("cdst").as("dst"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint(true)
    }
    println(s"[l2sf] contracted edges: ${ce.count()}")
    val cdeg = ce.groupBy(col("src").as("id")).agg(sum(col("w")).as("deg"))
      .localCheckpoint(true)
    val ew = ce.filter(col("src") =!= col("dst")).localCheckpoint(true)
    println(s"[l2sf] contracted nodes: ${cdeg.count()}, offdiag: ${ew.count()}")
    var labels = cdeg.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    for (r <- 1 to 6) {
      t(s"round $r") {
        val lab = labels
        val st = lab.join(cdeg, "id")
          .groupBy(col("label")).agg(sum(col("deg")).as("st"))
        val comm = t(s"  r$r comm ckpt") {
          ew
            .join(lab.select(col("id").as("src"), col("label").as("ca")), "src")
            .join(lab.select(col("id").as("dst"), col("label").as("cb")), "dst")
            .filter(col("ca") =!= col("cb"))
            .groupBy(col("ca"), col("cb")).agg(sum(col("w")).as("w2"))
            .localCheckpoint(true)
        }
        println(s"[l2sf]   r$r comm rows: ${comm.count()}")
        val gains = comm
          .join(st.select(col("label").as("ca"), col("st").as("sa")), "ca")
          .join(st.select(col("label").as("cb"), col("st").as("sb")), "cb")
          .select(col("ca"), col("cb"),
            (lit(m2) * col("w2") - col("sa") * col("sb")).as("g"))
          .filter(col("g") > 0)
        val w = Window.partitionBy(col("ca")).orderBy(col("g").desc,
          when(col("ca") % 2 === 0, col("cb")).otherwise(-col("cb")))
        val best = t(s"  r$r best ckpt") {
          gains.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).select(col("ca"), col("cb"))
            .localCheckpoint(true)
        }
        val mutual = t(s"  r$r mutual ckpt") {
          best.as("x").join(best.as("y"),
              col("x.cb") === col("y.ca") && col("x.ca") === col("y.cb"))
            .filter(col("x.ca") < col("x.cb"))
            .select(col("x.ca").as("a"), col("x.cb").as("b"))
            .localCheckpoint(true)
        }
        println(s"[l2sf]   round $r merges: ${mutual.count()}")
        labels = t(s"  r$r labels ckpt") {
          lab
            .join(mutual.select(col("b").as("label"), col("a")), Seq("label"), "left")
            .select(col("id"), coalesce(col("a"), col("label")).as("label"))
            .localCheckpoint(true)
        }
      }
    }
    spark.stop()
  }
}
