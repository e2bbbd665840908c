package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1): declared-schema readers and writers
  * replacing the reference's JSON/CSV file handoffs. Production paths are
  * always schema-declared — `inferSchema` is for exploration only; at
  * 100 TB a schema inference pass is a full extra scan.
  */
object Sources {

  /** S1/S2 — JSON with declared schema (schema-on-read, no inference). */
  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S3/S4 — staging CSV with header + declared schema. `multiLine` parses
    * quoted embedded newlines (the writer quotes them; without it the
    * reader misaligns rows — the reference's data has such titles). */
  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.option("header", "true").option("multiLine", "true")
      .schema(schema).csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S5 — append-only dead-letter sink. */
  def appendDeadLetter(df: DataFrame, path: String): Unit =
    df.write.mode("append").json(path)

  /** Standard columnar interchange (replaces the reference's text files):
    * snappy parquet, optionally partitioned. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
