package graft

import org.apache.spark.sql.SparkSession

/** One place for session config shared by Verify, Bench, and tests.
  *
  * - `shuffle.partitions` = worker-thread count, not the 200 default — at
  *   test scale extra partitions are pure scheduling overhead; on a real
  *   cluster this would be sized to ~2-3× total cores with AQE coalescing.
  * - AQE on: runtime partition coalescing, skew-join splitting, and
  *   dynamic broadcast selection — the knobs that matter at 100 TB.
  * - `nanosAsLong`: the driver's `events.parquet` carries TIMESTAMP(NANOS)
  *   which Spark 4 otherwise refuses to read (see [[Tables]]).
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // native function + ranking-rewrite rule on every engine session
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
