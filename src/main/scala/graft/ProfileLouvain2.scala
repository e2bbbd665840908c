package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Dev-only phase timer for the ring-of-cliques louvain2 fixture (round-7
  * debugging: the GraphSpec fixture hung; this isolates which phase). */
object ProfileLouvain2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("2", "graft-profile-louvain2")
    import spark.implicits._
    val n = 16
    val cliqueEdges = for {
      c <- 0 until n; i <- 0 until 4; j <- (i + 1) until 4
    } yield (c * 4L + i, c * 4L + j)
    val ringEdges = (0 until n).map(c => (c * 4L, ((c + 1) % n) * 4L + 1))
    val es = (cliqueEdges ++ ringEdges).toDF("src", "dst")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[l2] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val l1 = t("louvain l1") {
      Graph.louvain(es, rounds = 6).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    println(s"[l2] l1 communities: ${l1.values.toSet.size}")
    val l2 = t("louvain2 full") {
      Graph.louvain2(es, rounds1 = 6, rounds2 = 6).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    println(s"[l2] l2 communities: ${l2.values.toSet.size} sizes=${l2.groupBy(_._2).values.map(_.size).toSeq.sorted}")
    val q1 = t("modularity l1") {
      Graph.modularity(es, l1.toSeq.toDF("id", "label")).head
    }
    val q2 = t("modularity l2") {
      Graph.modularity(es, l2.toSeq.toDF("id", "label")).head
    }
    println(s"[l2] Q1=${q1.getLong(0)}/${q1.getLong(1)} Q2=${q2.getLong(0)}/${q2.getLong(1)}")
    spark.stop()
  }
}
