package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Pins.PinnedOps

/** Byte-pair-encoding tokenizer TRAINING (Sennrich, Haddow & Birch, ACL
  * 2016) as a distributed Spark job — the tokenizer-induction step of a
  * pre-training pipeline, not just the token-counting estimator
  * ([[TextAnalysis.bpeTokenStats]]).
  *
  * Scale design: the classic formulation, and the reason it survives
  * 100 TB — ONE corpus pass builds the distinct-word frequency table,
  * and every merge round after that runs on the VOCABULARY (bounded by
  * language, not corpus size). Each round is two vocabulary-bounded
  * aggregations (adjacent-pair counts weighted by word frequency, then a
  * 1-row argmax) plus a narrow per-word fold applying the merge; the
  * argmax row joins back via a cross join of a 1-row frame, so training
  * stays fully declarative — no driver-side loop state beyond the round
  * counter.
  *
  * Determinism: the winning pair breaks ties by (count DESC, a ASC,
  * b ASC) on both engines, and the merge application is the unique
  * greedy left-to-right non-overlapping matching, so the DuckDB twin
  * ([[trainSql]]) — which unrolls the same rounds with a recursive
  * leftmost-splice CTE per round — is bit-identical. (Leftmost-first
  * iterative replacement equals the single-pass greedy fold: a splice
  * can never create a match to the left of its own site, so successive
  * matches move strictly right.)
  */
object Bpe {

  /** Word-boundary marker appended as a single symbol (the `</w>` of the
    * original BPE paper — merges can absorb it, making learned tokens
    * word-final-aware). */
  val eow = "</w>"

  /** The twin's delimited-string representation separates symbols with
    * US (0x1f); words containing it are excluded on BOTH engines (a
    * guard for engine parity — real text never trips it). */
  val delim = "\u001f"

  /** Distinct-word frequency table — the one corpus-scale pass. */
  def wordTable(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextAnalysis.toks(text)).as("word"))
      .filter(!col("word").contains(delim))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** chars + end-of-word marker. */
  private def initSyms(word: Column): Column =
    concat(transform(sequence(lit(1), length(word)),
      i => word.substr(i, lit(1))), array(lit(eow)))

  /** Greedy left-to-right application of merge (a, b) → ab: a fold whose
    * accumulator is the merged prefix; seeded with the first symbol so
    * `element_at(acc, -1)` is always defined (ANSI-safe). */
  private def applyMerge(syms: Column, a: Column, b: Column): Column =
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      array(element_at(syms, 1)),
      (acc, x) => when(element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** Runs `merges` rounds; returns (merge table (rank, a, b, cnt),
    * final per-word symbol state (word, freq, syms)). Requires at least
    * one mergeable pair per round (always true while any word retains
    * ≥ 2 symbols — at `merges` ≪ total characters this never binds). */
  def trainFull(df: DataFrame, text: Column,
      merges: Int): (DataFrame, DataFrame) = {
    var words = wordTable(df, text)
      .select(col("word"), col("freq"), initSyms(col("word")).as("syms"))
      .pinned
    var out: Option[DataFrame] = None
    for (r <- 1 to merges) {
      val pairs = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("g"))
        .groupBy(col("g.a").as("a"), col("g.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      // 1-row winner: bounded TakeOrderedAndProject, deterministic ties
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(lit(r).as("rank"), col("a"), col("b"), col("cnt"))
        .pinned
      out = Some(out.fold(best)(_.unionByName(best)))
      words = words
        .crossJoin(best.select(col("a").as("_ma"), col("b").as("_mb")))
        .select(col("word"), col("freq"),
          applyMerge(col("syms"), col("_ma"), col("_mb")).as("syms"))
        .pinned
    }
    (out.get, words)
  }

  /** The learned merge table — THE artifact of BPE training. */
  def train(df: DataFrame, text: Column, merges: Int): DataFrame =
    trainFull(df, text, merges)._1

  /** Sub-word vocabulary after training: symbol → corpus frequency. */
  def subwordVocab(df: DataFrame, text: Column, merges: Int): DataFrame =
    trainFull(df, text, merges)._2
      .select(col("freq"), explode(col("syms")).as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("freq")).as("freq"))

  /** Encode the corpus with the learned tokenizer: per doc, word count
    * and sub-word count under the trained segmentation — the serving
    * side of the lifecycle (train → encode → token budget). Training
    * already segments EVERY corpus word (it runs on the full word
    * table), so encoding is one join from exploded doc words to the
    * final word → symbols state. */
  def encode(df: DataFrame, id: Column, text: Column,
      merges: Int): DataFrame = {
    val words = trainFull(df, text, merges)._2
    df.select(id.as("doc_id"), explode(TextAnalysis.toks(text)).as("word"))
      .filter(!col("word").contains(delim))
      .join(words.select(col("word"), size(col("syms")).as("ns")), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ns")).as("n_subwords"))
  }

  // ---- DuckDB twins ---------------------------------------------------

  private def toksSql = TextAnalysis.toksSql

  /** Shared CTE prefix: word table, initial delimited symbol strings,
    * and `merges` unrolled rounds (pair counts → 1-row argmax m{t} →
    * recursive leftmost-splice application → w{t}). */
  private def roundsCtes(table: String, merges: Int): String = {
    // AS MATERIALIZED throughout: without it DuckDB inlines each CTE at
    // every reference, and the per-round chain (p/r/w reference the
    // previous round 2-3x) re-evaluates the whole recursive history
    // exponentially — 8 rounds never finished; materialized it's ms.
    val init =
      s"""tokw AS MATERIALIZED (SELECT t AS word, COUNT(*) AS freq FROM (
         |    SELECT unnest($toksSql) AS t FROM $table)
         |  WHERE NOT contains(t, chr(31)) GROUP BY t),
         |w0 AS MATERIALIZED (SELECT word, freq,
         |    chr(31) || array_to_string(list_transform(range(1, length(word) + 1),
         |      i -> substr(word, CAST(i AS INT), 1)), chr(31))
         |      || chr(31) || '$eow' || chr(31) AS s
         |  FROM tokw)""".stripMargin
    val rounds = (1 to merges).map { t =>
      s"""p$t AS MATERIALIZED (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq,
         |      unnest(list_transform(range(1, len(sy)), i -> sy[CAST(i AS INT)])) AS a,
         |      unnest(list_transform(range(1, len(sy)), i -> sy[CAST(i + 1 AS INT)])) AS b
         |    FROM (SELECT freq, list_filter(string_split(s, chr(31)),
         |                 x -> length(x) > 0) AS sy FROM w${t - 1})
         |    WHERE len(sy) >= 2)
         |  GROUP BY a, b),
         |m$t AS MATERIALIZED (SELECT $t AS rank, a, b, cnt FROM p$t
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |r$t AS (
         |  SELECT word, freq, s FROM w${t - 1}
         |  UNION ALL
         |  SELECT word, freq,
         |      substr(s, 1, strpos(s, m.pat) - 1) || m.rep
         |        || substr(s, strpos(s, m.pat) + length(m.pat))
         |  FROM r$t, (SELECT chr(31) || a || chr(31) || b || chr(31) AS pat,
         |             chr(31) || a || b || chr(31) AS rep FROM m$t) m
         |  WHERE strpos(s, m.pat) > 0),
         |w$t AS MATERIALIZED (SELECT word, freq, s FROM r$t,
         |    (SELECT chr(31) || a || chr(31) || b || chr(31) AS pat FROM m$t) m
         |  WHERE strpos(s, m.pat) = 0)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  /** Twin of [[train]]. (Built by concatenation, NOT an outer
    * stripMargin — the embedded round CTEs contain `||` operators at
    * line starts, which a second stripMargin pass would eat.) */
  def trainSql(table: String, merges: Int): String = {
    val unionAll = (1 to merges)
      .map(t => s"SELECT rank, a, b, cnt FROM m$t").mkString("\n  UNION ALL ")
    "WITH RECURSIVE\n" + roundsCtes(table, merges) +
      s"\nSELECT * FROM (\n  $unionAll)"
  }

  /** Twin of [[encode]] (concatenation: see [[trainSql]]). */
  def encodeSql(table: String, merges: Int): String =
    "WITH RECURSIVE\n" + roundsCtes(table, merges) +
      s""",
         |wl AS MATERIALIZED (SELECT word,
         |    len(list_filter(string_split(s, chr(31)), x -> length(x) > 0)) AS ns
         |  FROM w$merges),
         |dt AS (SELECT doc_id, unnest($toksSql) AS word FROM $table)
         |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(ns) AS BIGINT) AS n_subwords
         |FROM dt JOIN wl USING (word)
         |WHERE NOT contains(word, chr(31))
         |GROUP BY doc_id""".stripMargin

  /** Twin of [[subwordVocab]] (concatenation: see [[trainSql]]). */
  def subwordVocabSql(table: String, merges: Int): String =
    "WITH RECURSIVE\n" + roundsCtes(table, merges) +
      s"""
         |SELECT symbol, CAST(SUM(freq) AS BIGINT) AS freq FROM (
         |  SELECT freq, unnest(list_filter(string_split(s, chr(31)),
         |         x -> length(x) > 0)) AS symbol
         |  FROM w$merges)
         |GROUP BY symbol""".stripMargin
}
