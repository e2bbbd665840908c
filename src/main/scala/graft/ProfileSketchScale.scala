package graft
import org.apache.spark.sql.functions._

/** Scale-stress for the r11 mergeable sketches: count–min and q-digest
  * at ×1 / ×10 input volume (disjoint id-offset copies of the sf0.1
  * tables). The claims under test are the 100 TB partial-aggregation
  * properties:
  *
  *  - CM register count is BOUNDED (≤ d·w per group) no matter the
  *    input volume — the build is one groupBy whose output cannot grow;
  *  - q-digest node count is BOUNDED (≈ 3k per group) and the build
  *    wall grows ~linearly with input (the QdL compression rounds see
  *    leaf counts, whose cardinality is capped by the value domain).
  *
  * Prints register/node counts and wall per stage; the ×10/×1 ratios go
  * to BASELINE.md. Dev-only main, not part of Verify/Bench. */
object ProfileSketchScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-sketch-scale")
    val dir = "/root/testdata/sf0.1"
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sketch] $l%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    import graft.operators.Sketches
    val events = Tables.events(spark, dir).cache(); events.count()
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice")).cache()
    li.count()
    for (m <- Seq(1, 10)) {
      val ev = (0 until m).map(i =>
          events.select(col("event_type"),
            (col("user_id") + lit(i * 1000000L)).as("user_id")))
        .reduce(_ unionByName _)
      t(s"cm registers x$m") {
        val regs = Sketches.cmRegisters(ev, col("event_type"), col("user_id"))
        println("  register rows: " + regs.count() +
          s" (bound ${Sketches.CmDepth * Sketches.CmWidth}/group)")
      }
      // r12: MG summary (top-k trim must stay WindowGroupLimit-pushed —
      // register count k-bounded, wall ∝ distinct keys) and bloom bits
      // (m-bounded per group however many keys set them)
      t(s"mg summary x$m") {
        val s = Sketches.mgSummary(ev, col("event_type"), col("user_id"))
        println("  mg rows: " + s.count() + s" (bound ${Sketches.MgK}/group)")
      }
      t(s"bloom registers x$m") {
        val regs = Sketches.bfRegisters(ev, col("event_type"), col("user_id"))
        println("  bloom bits: " + regs.count() +
          s" (bound ${Sketches.BfM}/group)")
      }
      // volume axis for the digest: x10 rows, same value domain — leaf
      // cardinality is domain-capped, so compression work stays flat
      val lix = (0 until m).map(_ => li).reduce(_ unionByName _)
      t(s"qdigest build+q x$m") {
        val res = Sketches.qdigestQuantiles(lix, col("l_returnflag"),
          floor(col("l_extendedprice")).cast("long"),
          Seq((1, 4), (1, 2), (9, 10)))
        res.collect().sortBy(r => (r.getString(0), r.getString(1)))
          .foreach(r => println("  " + r))
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      events.cache().count(); li.cache().count()
    }
    spark.stop()
  }
}
