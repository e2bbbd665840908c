package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks one test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  /** Exact count of Spark jobs started while `f` runs (listener bus
    * drained before and after — no sleeps). Suites run sequentially in
    * the forked test JVM, so the counter can't see other suites' jobs. */
  def jobsDuring(f: => Unit): Int = {
    val sc = spark.sparkContext
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    org.apache.spark.sql.graftshim.Shims.drainListenerBus(spark)
    sc.addSparkListener(l)
    try { f; org.apache.spark.sql.graftshim.Shims.drainListenerBus(spark) }
    finally sc.removeSparkListener(l)
    n.get()
  }
}
