package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the minimum md5-derived 56-bit hash over a
  * document's character n-gram windows — the winnowing-style fingerprint
  * of `TextAnalysis.fingerprint` in one fused loop per document.
  *
  * The composable formulation (`array_min(transform(shingles(lt, n),
  * md5Hash54))`) pays the same interpreted-HOF tax stage-profiling caught
  * on the MinHash signature ([[MinHashSignature]] scaladoc): every window
  * evaluates md5 → 32-char hex string → substring → base-16 `conv`
  * outside whole-stage codegen — `txt_fingerprint` benched 4.15 s at
  * sf0.1, the most expensive non-iterative headline query, with this
  * chain as its only non-trivial work.
  *
  * Bit-compatibility contract (spec-checked against the HOF form; keeps
  * the DuckDB twin valid): windows are the character substrings
  * `[i, i+n)` for `0 ≤ i ≤ numChars−n`; the hash is the first 14 hex
  * digits of md5 (= first 7 bytes big-endian unsigned — exactly
  * `TextFns.md5Hash54`); result is their minimum. Duplicate windows are
  * NOT collapsed (`shingles` dedupes, but a minimum is
  * multiplicity-blind). A document shorter than one window yields NULL,
  * matching `array_min(empty)`; NULL input yields NULL. */
case class MinGramHash(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN >= 1, s"min_gram_hash: n must be >= 1, got $shingleN")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_gram_hash expects a string column, got $t")
  }

  override def dataType: DataType = LongType

  // NULL for docs shorter than one window, not just for NULL input.
  override def nullable: Boolean = true

  override def prettyName: String = "min_gram_hash"

  override protected def nullSafeEval(s: Any): Any =
    MinGramHash.compute(s.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = graft.plans.MinGramHash.compute($c, $shingleN);
         |${ev.isNull} = r == null;
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinGramHash =
    copy(child = newChild)
}

object MinGramHash {

  /** One pass over the document (same skeleton as
    * [[MinHashSignature.compute]], ASCII fast path included): per window,
    * md5 → first 7 bytes as unsigned 56-bit Long, tracking the minimum.
    * Boxed Long, or null when no full-length window exists. */
  def compute(s: UTF8String, n: Int): Any = {
    val numChars = s.numChars()
    if (numChars < n) return null
    val md = MinHashSignature.md5.get()
    md.reset()
    var min = Long.MaxValue
    val bytes = s.getBytes
    val ascii = bytes.length == numChars
    var i = 0
    while (i <= numChars - n) {
      if (ascii) md.update(bytes, i, n)
      else md.update(s.substring(i, i + n).getBytes)
      val d = md.digest() // resets the digest for the next window
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }
}
