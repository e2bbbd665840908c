package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Round-trips for the source/sink surface with declared schemas,
  * including the reference mocks' edge content: quoted publisher with a
  * comma, diacritics, embedded newline (CSV quoting), nulls. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("publisher", StringType),
    StructField("author", StringType),
    StructField("cites", IntegerType)))

  private val rows = Seq(
    Row("p1", "Science and Education Publishing Co., Ltd.", "C. Balázs", 7),
    Row("p2", "Line\nBreak Press", "Alberto Torchinsky", 0),
    Row("p3", null, "Alberto Torchinsky", null))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(rows), schema)

  test("CSV round-trip preserves quoted commas, diacritics, nulls") {
    val dir = Files.createTempDirectory("csv").toString + "/out"
    Sources.writeCsv(df, dir)
    val back = Sources.readCsv(spark, schema, dir)
      .orderBy("id").collect()
    assert(back(0).getString(1) == "Science and Education Publishing Co., Ltd.")
    assert(back(0).getString(2) == "C. Balázs")
    assert(back(2).isNullAt(1) && back(2).isNullAt(3))
  }

  test("JSON round-trip with declared schema (no inference)") {
    val dir = Files.createTempDirectory("json").toString + "/out"
    Sources.writeJson(df, dir)
    val back = Sources.readJson(spark, schema, dir).orderBy("id").collect()
    assert(back.length == 3)
    assert(back(1).getString(1) == "Line\nBreak Press")
    assert(back(0).getInt(3) == 7)
  }

  test("dead-letter sink appends across writes") {
    val dir = Files.createTempDirectory("dl").toString + "/failures"
    Sources.appendDeadLetter(df.limit(1), dir)
    Sources.appendDeadLetter(df.limit(2), dir)
    assert(spark.read.schema(schema).json(dir).count() == 3)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("pq").toString + "/out"
    Sources.writeParquet(df.na.fill("Unknown", Seq("publisher")),
      dir, partitionBy = Seq("author"))
    val pruned = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("author") === "Alberto Torchinsky")
    assert(pruned.count() == 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || pruned.inputFiles.length <= 2)
  }
}
