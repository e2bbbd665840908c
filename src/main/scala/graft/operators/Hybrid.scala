package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval with reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009) — the standard production shape: a keyword
  * candidate list and a vector candidate list per query, fused by
  * `Σ 1/(c + rank)` over the lists where the doc appears. Rank fusion
  * needs no score calibration between the two retrievers, which is
  * exactly why it ships everywhere — and why it oracle-checks: each RRF
  * term is one exact integer division and the two terms add in fixed
  * (keyword, vector) order, so the twin hashes bit-equal.
  *
  * Scale shape: both candidate stages are top-`n`-per-query (bounded
  * output keyed by query), the fusion is a join on (query, doc) of two
  * n-row-per-query frames, and nothing corpus-scale crosses the fuse.
  * The fuse is a FULL OUTER join, which Spark cannot broadcast (both
  * sides must be complete), so the plan shows one SortMergeJoin — over
  * two ≤ n·|Q|-row inputs, the bounded place to pay a sort. */
object Hybrid {

  /** Keyword candidates: per query doc, corpus docs ranked by distinct
    * shared-token count (DESC, doc_id) — bag-of-words overlap, the
    * token-level retriever. One distinct-token inverted join. */
  def keywordRanks(docs: DataFrame, id: Column, text: Column,
      isQuery: Column, n: Int): DataFrame = {
    val tok = docs.select(id.as("doc_id"),
      explode(array_distinct(TextAnalysis.toks(text))).as("token"))
    val qtok = docs.filter(isQuery)
      .select(id.as("query_id"), explode(array_distinct(
        TextAnalysis.toks(text))).as("token"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("overlap").desc, col("doc_id"))
    qtok.join(tok, "token")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("kr", row_number().over(w))
      .filter(col("kr") <= n)
      .select(col("query_id"), col("doc_id"), col("kr"))
  }

  /** RRF fusion of the keyword list and the brute-force cosine list
    * (swap in any ANN list at scale — the fusion only sees ranks). */
  def rrfTopK(docs: DataFrame, id: Column, text: Column, emb: DataFrame,
      isQueryDoc: Column, isQueryVec: Column, k: Int, n: Int,
      c: Int = 60): DataFrame = {
    val kw = keywordRanks(docs, id, text, isQueryDoc, n)
    val vr = Similarity.bruteForceTopK(emb, isQueryVec, n)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("vr"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    kw.join(vr, Seq("query_id", "doc_id"), "outer")
      .select(col("query_id"), col("doc_id"),
        // fixed (keyword, vector) term order; each term one exact
        // integer division — deterministic doubles on both engines
        (coalesce(lit(1.0) / (lit(c) + col("kr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("vr")), lit(0.0))).as("rrf"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"), col("rrf"))
  }

  /** Twin: distinct-token overlap ranks + cosine ranks + fused RRF.
    * Needs the similarity module's `e(vec_id, v)` CTE in scope;
    * `cosExpr` is the module's cosine SQL. */
  def rrfSql(docsTable: String, cosExpr: String, nQueries: Int, k: Int,
      n: Int, c: Int = 60): String =
    s"""dtok AS MATERIALIZED (SELECT DISTINCT doc_id,
       |    unnest(${TextAnalysis.toksSql}) AS token FROM $docsTable),
       |ovl AS (SELECT q.doc_id AS query_id, d.doc_id, COUNT(*) AS overlap
       |  FROM dtok q JOIN dtok d USING (token)
       |  WHERE q.doc_id < $nQueries AND d.doc_id <> q.doc_id
       |  GROUP BY q.doc_id, d.doc_id),
       |kw AS (SELECT query_id, doc_id, kr FROM (
       |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY overlap DESC, doc_id) AS kr
       |    FROM ovl) WHERE kr <= $n),
       |vq AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < $nQueries),
       |vscored AS (SELECT vq.query_id, e.vec_id AS doc_id,
       |    ${cosExpr} AS cos
       |  FROM vq JOIN e ON e.vec_id <> vq.query_id),
       |vr AS (SELECT query_id, doc_id, vr FROM (
       |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, doc_id) AS vr
       |    FROM vscored) WHERE vr <= $n),
       |fused AS (SELECT COALESCE(kw.query_id, vr.query_id) AS query_id,
       |    COALESCE(kw.doc_id, vr.doc_id) AS doc_id,
       |    COALESCE(CAST(1.0 AS DOUBLE) / ($c + kw.kr), 0.0)
       |      + COALESCE(CAST(1.0 AS DOUBLE) / ($c + vr.vr), 0.0) AS rrf
       |  FROM kw FULL OUTER JOIN vr
       |    ON vr.query_id = kw.query_id AND vr.doc_id = kw.doc_id),
       |rrfranked AS (SELECT query_id, doc_id, rrf, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
       |  FROM fused)
       |SELECT query_id, doc_id, rnk, rrf
       |FROM rrfranked WHERE rnk <= $k""".stripMargin
}
