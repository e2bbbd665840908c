package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{BiQueriesWarehouse, Warehouse}

/** The reference's 15 BI queries over a star schema loaded from
  * mock-shaped staging data — hand-computed goldens on a corpus small
  * enough to reason about (the executable version of the reference's
  * screenshot checks, SURVEY §5.4). */
class BiWarehouseSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._


  // 4 papers: 2 physics (Ada: 10+4 cites; Bob on one), 1 math (Ada, 0
  // cites), 1 Astrophysics 2005 (Cay). Venues: PRL(2), AMS(1), ApJ(1).
  private lazy val state = Warehouse.loadBatch(spark, Warehouse.emptyState(spark),
    Fixtures.staged(Seq(
      ("a1", "physics", 2020, "journal-article", "PRL", "APS", 10,
        Seq(("Ada", "A", "MIT", "female", "A Ada"),
          ("Bob", "B", "ETH", "male", "B Bob"))),
      ("a2", "physics", 2021, "journal-article", "PRL", "APS", 4,
        Seq(("Ada", "A", "MIT", "female", "A Ada"))),
      ("a3", "mathematics", 2012, "journal-article", "AMS", "AMS", 0,
        Seq(("Ada", "A", null, "female", "A Ada"))),
      ("a4", "Astrophysics", 2005, "journal-article", "ApJ", "AAS", 7,
        Seq(("Cay", "C", "UT", "unknown", "C Cay"))),
      ("a5", "Physics", 2021, "journal-article", "ApJ", "AAS", 3,
        Seq(("Cay", "C", "UT", "unknown", "C Cay"))))))

  test("q1: author paper counts in %physics% domain") {
    // reference output shape: (ranking, full_name) only (queries.sql:4)
    val r = BiQueriesWarehouse.q1(state, "%physics%")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // case-sensitive LIKE: matches 'physics' AND 'Astrophysics' (which
    // contains the lowercase substring), but NOT 'Physics'
    assert(r == Set((1, "A Ada"), (2, "B Bob"), (2, "C Cay")))
  }

  test("q2: citation sums rank Ada(14) over Bob(10)") {
    val r = BiQueriesWarehouse.q2(state, "%physics%")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(r == Set((1, "A Ada"), (2, "B Bob"), (3, "C Cay"))) // 14 > 10 > 7
  }

  test("q5: global paper ranking by citations") {
    val r = BiQueriesWarehouse.q5(state).orderBy("ranking")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(r.head == ((1, 10, "T-a1")))
    assert(r.last == ((5, 0, "T-a3")))
  }

  test("q6/q7: affiliation ranks exclude Unknown; year bound drops old paper") {
    val q6 = BiQueriesWarehouse.q6(state)
      .collect().map(r => (r.getString(1), r.getInt(0))).toMap
    assert(q6 == Map("MIT" -> 1, "UT" -> 1, "ETH" -> 2)) // a3's Unknown excluded
    val q7 = BiQueriesWarehouse.q6(state, Some(2010 -> 2022))
      .collect().map(r => (r.getString(1), r.getInt(0))).toMap
    assert(q7 == Map("MIT" -> 1, "UT" -> 2, "ETH" -> 2)) // 2005 paper out of range
  }

  test("q9: rounded average citations per affiliation") {
    val r = BiQueriesWarehouse.q9(state)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(r("MIT") == 7.0) // (10+4)/2
    assert(r("UT") == 5.0)  // (7+3)/2
  }

  test("q12/q13: venue averages and math venue count") {
    val q12 = BiQueriesWarehouse.q12(state)
      .collect().map(r => (r.getString(2), r.getDouble(1))).toMap
    assert(q12("PRL") == 7.0 && q12("AMS") == 0.0 && q12("ApJ") == 5.0)
    val q13 = BiQueriesWarehouse.q13(state, "%math%")
      .collect().map(r => (r.getString(2), r.getLong(1))).toMap
    assert(q13 == Map("AMS" -> 1L))
  }

  test("q14/q15: year ranks and domain histogram ordering") {
    val q14 = BiQueriesWarehouse.q14(state)
      .collect().map(r => (r.getInt(2), r.getLong(1))).toMap
    assert(q14 == Map(2020 -> 1L, 2021 -> 2L, 2012 -> 1L, 2005 -> 1L))
    val q15 = BiQueriesWarehouse.q15(state, "%math%", 2010, 2022)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(q15.toSeq == Seq((2012, 1L)))
  }

  test("all 15 queries run non-empty on the loaded warehouse") {
    BiQueriesWarehouse.all(state).foreach { case (name, df) =>
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
