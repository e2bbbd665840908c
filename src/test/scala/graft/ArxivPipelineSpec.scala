package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Cleaning, Enrichment, Warehouse}

/** End-to-end ArXiv-shaped pipeline on mock-fixture-shaped data
  * (FIXTURES.md §A1–A4): clean → enrich → star-schema load, covering the
  * reference's edge rows — withdrawn abstract, embedded newlines,
  * duplicate (title, authors), diacritics, one author across two papers,
  * zero-citation paper — plus load idempotence and incremental h-index.
  */
class ArxivPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rawSchema = StructType(Seq(
    StructField("id", StringType), StructField("submitter", StringType),
    StructField("authors", StringType), StructField("title", StringType),
    StructField("comments", StringType), StructField("journal-ref", StringType),
    StructField("doi", StringType), StructField("report-no", StringType),
    StructField("categories", StringType), StructField("license", StringType),
    StructField("abstract", StringType),
    StructField("versions", ArrayType(StructType(Seq(
      StructField("version", StringType), StructField("created", StringType))))),
    StructField("update_date", StringType),
    StructField("authors_parsed", ArrayType(ArrayType(StringType)))))

  private def raw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), rawSchema)

  private def paper(id: String, authors: String, title: String,
      abstr: String = "We study things.",
      versions: Seq[(String, String)] = Seq(("v1", "Mon")),
      parsed: Seq[Seq[String]] = Seq(Seq("Doe", "John", ""))) =
    Row(id, "sub", authors, title, "cmt", "jref", s"10.0/$id", "rn",
      "math.CO", "lic", abstr,
      versions.map { case (v, c) => Row(v, c) }, "2020-01-01",
      parsed)

  private val fixture = raw(Seq(
    paper("p1", "John Doe", "A Study\nof Graphs",
      parsed = Seq(Seq("Doe", "John", "", "Tartu Univ."))),
    paper("p2", "C. Balázs", "Diacritics in Physics",
      parsed = Seq(Seq("Balázs", "C.", ""))),
    // withdrawn -> dropped by P1
    paper("p3", "Gone Author", "Withdrawn Work",
      abstr = "  This paper has been withdrawn by the author"),
    // duplicate of p1 modulo normalization -> D1 keeps p1 (lower id)
    paper("p4", "John  Doe!", "a study of graphs"),
    // multi-version -> latest v3 (F13); same author on a second paper
    paper("p5", "John Doe", "Second Paper",
      versions = Seq(("v1", "Mon"), ("v3", "Wed")))))

  private def cleaned = Cleaning.cleanAll(fixture, col("id"))

  test("cleaning: withdrawn dropped, dup collapsed, latest version, newline strip") {
    val c = cleaned.orderBy("id").collect()
    assert(c.map(_.getAs[String]("id")).toSeq == Seq("p1", "p2", "p5"))
    val p1 = c(0)
    assert(p1.getAs[String]("title") == "A Studyof Graphs") // \n stripped
    assert(c(2).getAs[String]("latest_version") == "v3")
    // F14: struct extraction with empty affiliations filtered
    val a1 = p1.getAs[scala.collection.Seq[Row]]("authors_struct").head
    assert(a1.getAs[String]("family") == "Doe")
    assert(a1.getAs[scala.collection.Seq[String]]("affiliation") == Seq("Tartu Univ."))
    assert(c(1).getAs[scala.collection.Seq[Row]]("authors_struct").head
      .getAs[scala.collection.Seq[String]]("affiliation").isEmpty)
  }

  test("author-list merge prefers fuller names and longer affiliations") {
    val df = Seq(1).toDF("x").select(
      Enrichment.mergeAuthorLists(
        typedLit(Seq(("Doe", "J.", "Uni"))).cast(
          "array<struct<family:string,given:string,affiliation:string>>"),
        typedLit(Seq(("Doe", "John", ""))).cast(
          "array<struct<family:string,given:string,affiliation:string>>"))
        .as("merged"))
    val m = df.collect().head.getAs[scala.collection.Seq[Row]]("merged").head
    assert(m.getAs[String]("given") == "John")     // more bytes, same parts
    assert(m.getAs[String]("affiliation") == "Uni") // longer side wins
  }

  test("gender assignment folds mostly_* and unknowns via broadcast dict") {
    val dict = Seq(("john", "male"), ("maria", "mostly_female"), ("kim", "andy"))
      .toDF("name", "gender")
    val papers = Seq(("p1",
      Seq(("Doe", "John Q.", null: String), ("Lee", "Maria", null: String),
        ("Park", "Kim", null: String), ("X", "Zzz", null: String))))
      .toDF("id", "am")
      .select(col("id"), col("am").cast(
        "array<struct<family:string,given:string,affiliation:string>>")
        .as("authors_merged"))
    val out = Enrichment.assignGenders(papers, dict)
      .collect().head.getAs[scala.collection.Seq[Row]]("authors_merged")
      .map(r => r.getAs[String]("full_name") -> r.getAs[String]("gender")).toMap
    assert(out("John Q. Doe") == "male")   // first-token lookup
    assert(out("Maria Lee") == "female")   // mostly_female folded
    assert(out("Kim Park") == "unknown")   // andy folded
    assert(out("Zzz X") == "unknown")      // miss -> unknown
  }


  private val batch1 = Fixtures.staged(Seq(
    ("p1", "Physics", 2020, "journal-article", "PRL", "APS", 10,
      Seq(("Doe", "John", "Tartu Univ.", "male", "John Doe"),
        ("Balázs", "C.", null, "unknown", "C. Balázs"))),
    ("p2", "Mathematics", 2021, "journal-article", "AMS", "AMS", 0,
      Seq(("Doe", "John", "Tartu Univ.", "male", "John Doe")))))

  private val batch2 = Fixtures.staged(Seq(
    // p1 again (replay) + one new paper by the same author
    ("p1", "Physics", 2020, "journal-article", "PRL", "APS", 10,
      Seq(("Doe", "John", "Tartu Univ.", "male", "John Doe"))),
    ("p3", "Physics", 2020, "preprint", "arXiv", "arXiv", 5,
      Seq(("Doe", "John", null, "male", "John Doe")))))

  test("warehouse load: dims, fact, bridges, metrics; idempotent replay") {
    val s1 = Warehouse.loadBatch(spark, Warehouse.emptyState(spark), batch1)
    assert(s1.fact.count() == 2)
    assert(s1.dimAuthor.count() == 2)
    assert(s1.dimVenue.count() == 2)
    // John Doe: citations {10, 0} -> h=1 (10>=1, 0<2), g: nonzero {10} -> 1
    val doe1 = s1.dimAuthor.filter(col("full_name") === "John Doe")
      .select("h_index", "g_index").head
    assert(doe1.getInt(0) == 1 && doe1.getInt(1) == 1)
    // bridges: p1 group has 2 authors, p2 group 1
    assert(s1.bridgeAuthor.count() == 3)

    // replay p1 + add p3: fact gains only p3; Doe's h-index becomes
    // citations {10, 0, 5} -> h=2; surrogate keys unchanged for old rows
    val s2 = Warehouse.loadBatch(spark, s1, batch2)
    assert(s2.fact.count() == 3)
    assert(s2.fact.filter(col("arxiv_ID") === "p1").count() == 1)
    val doe2 = s2.dimAuthor.filter(col("full_name") === "John Doe")
      .select("h_index", "g_index").head
    assert(doe2.getInt(0) == 2)
    val key1 = s1.dimAuthor.filter(col("full_name") === "John Doe")
      .select("author_key").head.getInt(0)
    val key2 = s2.dimAuthor.filter(col("full_name") === "John Doe")
      .select("author_key").head.getInt(0)
    assert(key1 == key2)
    // affiliation dim got 'Unknown' for the null affiliation
    assert(s2.dimAffiliation.filter(col("affiliation_name") === "Unknown").count() == 1)
  }

  test("BI query over the loaded star schema reproduces the ranking shape") {
    val s = Warehouse.loadBatch(spark, Warehouse.emptyState(spark), batch1)
    // "ranking papers by citation count" (queries.sql:43-45)
    val ranked = s.fact
      .withColumn("ranking", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("citation_count").desc)))
      .select("ranking", "citation_count", "title")
      .orderBy("ranking").collect()
    assert(ranked.head.getAs[String]("title") == "T-p1")
    assert(ranked.head.getAs[Int]("ranking") == 1)
    assert(ranked.last.getAs[Int]("citation_count") == 0)
  }
}
