package graft
import org.apache.spark.sql.functions._

/** A/B for the Bloom runtime semi-join prune (VERDICT r11 #5) on the
  * j11-shaped join at sf0.1: how many probe-side (orders) rows does the
  * build side's broadcast bloom drop before the exact join, and what
  * does the prune cost relative to the plain semi-join. Results
  * recorded in BASELINE.md. */
object ProfileBloomPrune {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "prof-bloom-prune")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val probe = Tables.orders(spark, dir).cache()
    val build = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000).cache()
    println(s"[bp] probe rows:    ${probe.count()}")
    println(s"[bp] build rows:    ${build.count()}")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bp] $l%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val regs = graft.operators.Sketches
      .bfRegisters(build, lit(0L), col("c_custkey"))
      .select(col("b")).cache()
    println(s"[bp] bloom bits set: ${regs.count()} of " +
      graft.operators.Sketches.BfM)
    // warm-up both paths once, then timed
    val exactN = probe.join(build.select(col("c_custkey")).distinct(),
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    println(s"[bp] true matches:  $exactN")
    val survN = graft.operators.Sketches
      .bloomPrune(probe, "o_custkey", regs).count()
    println(s"[bp] bloom kept:    $survN (false positives: ${survN - exactN})")
    for (i <- 1 to 3) {
      t(s"plain semi #$i") {
        probe.join(build.select(col("c_custkey")).distinct(),
          col("o_custkey") === col("c_custkey"), "left_semi")
          .write.mode("overwrite").format("noop").save()
      }
      t(s"bloom+exact semi #$i") {
        graft.operators.Sketches
          .bloomSemiJoin(probe, "o_custkey", build, "c_custkey")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
