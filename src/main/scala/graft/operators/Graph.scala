package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics as iterative DataFrame programs — the reference's
  * Neo4j/GDS surface (`/root/reference/dags/graph_queries.cyp`)
  * re-expressed without a graph engine: a graph is a pair of DataFrames
  * `nodes(id, label, …)` / `edges(src, dst, etype)`, algorithms are loops
  * of joins+aggregations with `localCheckpoint` lineage truncation per
  * iteration.
  *
  * Scale notes: every iteration is one shuffle keyed by node id — the
  * natural co-partitioning for a 1000-executor run is hash(id) on both
  * ranks and edges so the join is local after the first shuffle; Spark's
  * AQE reuses the exchange. Nothing collects to the driver except loop
  * counters and convergence checks (single-row aggregates).
  */
object Graph {

  /** Directed PageRank. Simple-uniform teleport, dangling mass dropped
    * (matches the common simplified formulation; GDS normalizes
    * differently — capability parity, not score-identical, per SURVEY
    * §2.10 G1). */
  def pageRank(edges: DataFrame, iters: Int = 20, damping: Double = 0.85): DataFrame = {
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count().toDouble
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), col("deg")).cache()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("csum"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("csum"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    withDeg.unpersist()
    ranks
  }

  /** G7 — node similarity: Jaccard over out-neighbor sets, self-pairs
    * excluded. Pure joins: Σ_v deg(v)² pair generation through the shared
    * neighbor, exact — the deterministic, oracle-checkable one. */
  def jaccardSimilarity(edges: DataFrame, threshold: Double): DataFrame = {
    // null endpoints dropped up front: a groupBy- or join-based pair
    // generator would otherwise treat NULL as a shared neighbor
    val adj = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    // pair generation stays a streamed self-join: a per-dst
    // collect_list+combination variant materializes a hub's full deg²/2
    // pair array in ONE row — an OOM on celebrity neighbors — where the
    // join emits pairs incrementally with spill.
    val inter = adj.as("a")
      .join(adj.as("b"), col("a.dst") === col("b.dst") &&
        col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("id_a"), col("b.src").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(deg.as("da"), col("da.src") === col("id_a"))
      .join(deg.as("db"), col("db.src") === col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter") * lit(1.0) /
          (col("da.deg") + col("db.deg") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** G8 — bounded k-hop reachability (the `REFERENCES*1..k` pattern):
    * distinct (src, dst) pairs reachable in 1..k hops. */
  def kHopReach(edges: DataFrame, k: Int): DataFrame = {
    val base = edges.select(col("src"), col("dst")).distinct()
    var reach = base
    var frontier = base
    for (_ <- 2 to k) {
      // column-renamed join (not string aliases): self-join attribute
      // resolution is fragile across localCheckpoint'd plans
      val f = frontier.select(col("src").as("f_src"), col("dst").as("f_dst"))
      frontier = f.join(base, col("f_dst") === col("src"))
        .select(col("f_src").as("src"), col("dst"))
        .distinct()
        .localCheckpoint(true)
      reach = reach.union(frontier).distinct().localCheckpoint(true)
    }
    reach
  }

  /** G5 — community detection via connected components (min-label
    * propagation to fixpoint over the undirected graph). Min is
    * order-independent → fully deterministic. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    val nodes = und.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("component", col("id")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = und
        .join(labels, und("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    und.unpersist()
    labels
  }

  /** G6 — Brandes betweenness centrality from a sampled source set
    * (unweighted). Forward BFS accumulates shortest-path counts σ per
    * level; the backward sweep pushes dependencies level by level. Exact
    * when `sources` = all nodes; sampling bounds work at scale. */
  def betweennessSampled(edges: DataFrame, sources: Seq[Long]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select(col("src"), col("dst")).distinct().cache()
    var acc = spark.emptyDataset[(Long, Double)].toDF("id", "delta")

    for (s <- sources) {
      // forward: dist + sigma per node (column-renamed joins throughout —
      // string aliases don't survive localCheckpoint'd self-joins)
      var levels = Seq((s, 0, 1.0)).toDF("id", "dist", "sigma").localCheckpoint(true)
      var frontier = levels
      var level = 0
      var done = false
      while (!done) {
        val f = frontier.select(col("id").as("f_id"), col("sigma").as("f_sigma"))
        val nxt = f.join(adj, col("f_id") === col("src"))
          .select(col("dst").as("id"), col("f_sigma").as("sigma"))
          .join(levels.select(col("id").as("seen")),
            col("id") === col("seen"), "left_anti")
          .groupBy("id").agg(sum("sigma").as("sigma"))
          .withColumn("dist", lit(level + 1))
          .select("id", "dist", "sigma")
          .localCheckpoint(true)
        if (nxt.isEmpty) done = true
        else {
          levels = levels.union(nxt).localCheckpoint(true)
          frontier = nxt
          level += 1
        }
      }
      // backward: delta accumulation from deepest level
      var delta = levels.select(col("id"), lit(0.0).as("delta")).localCheckpoint(true)
      for (l <- level to 1 by -1) {
        val w = levels.filter(col("dist") === l)
          .select(col("id").as("w_id"), col("sigma").as("w_sigma"))
          .join(delta.select(col("id").as("d_id"), col("delta").as("w_delta")),
            col("w_id") === col("d_id"))
          .select(col("w_id"), col("w_sigma"), col("w_delta"))
        val prev = levels.filter(col("dist") === l - 1)
          .select(col("id").as("v_id"), col("sigma").as("v_sigma"))
        val msgs = adj.join(w, col("dst") === col("w_id"))
          .join(prev, col("src") === col("v_id"))
          .select(col("v_id").as("id"),
            (col("v_sigma") / col("w_sigma") * (lit(1.0) + col("w_delta")))
              .as("m"))
          .groupBy("id").agg(sum("m").as("madd"))
        delta = delta
          .join(msgs.select(col("id").as("m_id"), col("madd")),
            col("id") === col("m_id"), "left")
          .select(col("id"),
            (col("delta") + coalesce(col("madd"), lit(0.0))).as("delta"))
          .localCheckpoint(true)
      }
      acc = acc.union(delta.filter(col("id") =!= s)).localCheckpoint(true)
    }
    adj.unpersist()
    acc.groupBy("id").agg(sum("delta").as("betweenness"))
  }

  /** G2–G4 — "ArticleRank"-style projected PageRank: project an
    * entity→entity graph through a 2-hop relation (e.g. author→author via
    * co-referenced pieces), then PageRank it. */
  def projectedPageRank(projection: DataFrame, iters: Int = 15): DataFrame =
    pageRank(projection, iters)
}
