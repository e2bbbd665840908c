package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Stage-level wall-time breakdown of `txt_langid`, which benched 3.6×
  * slower in round 6 (0.57→2.07s) on unchanged code. Isolates the
  * candidate costs named in VERDICT r6:
  *   scan    — raw (doc_id, text) projection, no compute
  *   toks    — tokenize only (split+filter HOF)
  *   one     — a single marker count (one isInCollection filter pass)
  *   four    — all four marker counts (the 4× filter-pass structure)
  *   cjk     — the CJK codepoint-class rlike alone
  *   full    — TextAnalysis.langId as benched (incl. orderBy)
  * Each stage: one untimed warm-up, then median of 5, same protocol as
  * Bench so numbers are comparable to BENCH_r06.
  * Run: sbt "runMain graft.ProfileLangId" (SPARK_GRAFT_SF_DIR selects SF).
  */
object ProfileLangId {
  private val lines = scala.collection.mutable.ArrayBuffer[String]()
  private def emit(s: String): Unit = { println(s); lines += s }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-profile-langid")
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def timed(label: String)(df: => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm-up
      val m = median((1 to 5).map(_ => run()))
      emit(f"[profile] $label%-28s $m%8.3fs")
      m
    }

    val t = TextAnalysis.toks(col("text"))
    val de = TextAnalysis.langMarkers.head._2
    timed("scan (project only)")(docs.select(col("doc_id"), col("text")))
    timed("toks (split+filter)")(docs.select(col("doc_id"), size(t).as("n")))
    timed("one marker count")(docs.select(col("doc_id"),
      size(filter(t, x => x.isInCollection(de))).as("s_de")))
    timed("four marker counts")(docs.select(
      (Seq(col("doc_id")) ++ TextAnalysis.langMarkers.map { case (l, ws) =>
        size(filter(t, x => x.isInCollection(ws))).as(s"s_$l")
      }): _*))
    timed("cjk rlike only")(docs.select(col("doc_id"),
      col("text").rlike("[\\x{4e00}-\\x{9fff}]").as("cjk")))
    // Variant B: tokenize ONCE in a first projection (CollapseProject keeps
    // the split un-inlined when its alias is referenced 4x and non-cheap),
    // then 4 filter passes over the materialized array.
    timed("B: toks once + 4 filters")(docs
      .select(col("doc_id"), t.as("t"))
      .select((Seq(col("doc_id")) ++ TextAnalysis.langMarkers.map {
        case (l, ws) =>
          size(filter(col("t"), x => x.isInCollection(ws))).as(s"s_$l")
      }): _*))
    // Variant C: tokenize once + ONE aggregate pass accumulating all four
    // counts in a struct (1 traversal instead of 4).
    def onePass(tokens: org.apache.spark.sql.Column) =
      aggregate(tokens,
        struct(TextAnalysis.langMarkers.map { case (l, _) => lit(0).as(s"s_$l") }: _*),
        (acc, x) => struct(TextAnalysis.langMarkers.map { case (l, ws) =>
          (acc.getField(s"s_$l") +
            when(x.isInCollection(ws), 1).otherwise(0)).as(s"s_$l")
        }: _*))
    timed("C: toks once + 1-pass agg")(docs
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), onePass(col("t")).as("c"))
      .select(col("doc_id"), col("c.s_de"), col("c.s_en"), col("c.s_es"),
        col("c.s_fr")))
    timed("full langId (as benched)")(
      TextAnalysis.langId(docs, col("doc_id"), col("text"))
        .orderBy(col("doc_id")))
    timed("full langId (repeat)")(
      TextAnalysis.langId(docs, col("doc_id"), col("text"))
        .orderBy(col("doc_id")))
    // sbt --error swallows run stdout; keep a clean copy like Bench does
    val out = sys.env.getOrElse("SPARK_GRAFT_PROFILE_OUT", "/tmp/profile_langid.txt")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
