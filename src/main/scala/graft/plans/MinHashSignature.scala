package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the k MinHash minima of a document's
  * character n-gram shingle set, in one fused loop per document.
  *
  * The composable formulation (`shingles` HOF → `transform(md5→conv)` →
  * k× `array_min(transform(xor·mul&mask))`) is semantically right but
  * evaluates interpreted lambda chains PER SHINGLE — higher-order
  * functions sit outside whole-stage codegen, and each element pays
  * md5 → 32-char hex string → substring → base-16 parse. Stage-profiled
  * at sf0.1 this made signature construction ~5s of the ~4s warm
  * `dd_minhash_lsh_neardup` pipeline — the single hottest stage of the
  * benchmark's most expensive query. This expression is the engine's
  * preference order applied (composition > native Expression > UDF):
  * one eval per document, md5 bytes consumed directly (no hex), minima
  * tracked in a flat array.
  *
  * Bit-compatibility contract (spec-checked against the HOF form, and
  * what keeps the DuckDB oracle valid): shingle positions are the
  * character-based substrings `[i, i+n)` for `0 ≤ i ≤ numChars−n` —
  * exactly `substr(i+1, n)` filtered to full length; the 56-bit hash is
  * the first 14 hex digits of md5 (= first 7 bytes, big-endian unsigned);
  * derivation i is `((h ^ saltXor(i)) * saltMul(i)) & hashMask` in Long
  * arithmetic. Shingle DE-duplication is deliberately skipped: duplicate
  * shingles produce identical derived values and a minimum is multiplicity
  * -blind, so `array_distinct` cost buys nothing here. A document with no
  * full-length shingle (numChars < n) yields NULL, matching
  * `array_min(empty)`; a NULL document yields NULL (UnaryExpression).
  *
  * Salt family: [[graft.operators.Dedup.saltXor]] / `saltMul` /
  * `hashMask` — the same constants the SQL twin embeds, so the two
  * derivations cannot drift (overflow analysis in Dedup's scaladoc).
  */
case class MinHashSignature(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression {

  require(shingleN >= 1, s"minhash_sig: shingleN must be >= 1, got $shingleN")
  require(k >= 1 && k <= MinHashSignature.maxK,
    s"minhash_sig: derived-salt family supports 1 <= k <= ${MinHashSignature.maxK}, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a string column, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // NULL for docs shorter than one shingle, not just for NULL input.
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(s: Any): Any =
    MinHashSignature.compute(s.asInstanceOf[UTF8String], shingleN, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.MinHashSignature.compute($c, $shingleN, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val saltXor: Array[Long] = graft.operators.Dedup.saltXor.toArray
  private val saltMul: Array[Long] = graft.operators.Dedup.saltMul.toArray
  private val hashMask: Long = graft.operators.Dedup.hashMask

  val maxK: Int = math.min(saltXor.length, saltMul.length)

  // One digest per executor thread, not per row (ADVICE r6): this is the
  // bench's hottest expression, and MessageDigest.getInstance is a
  // provider lookup + allocation. digest() leaves the instance reset, so
  // reuse across rows/shingles is safe; ThreadLocal because Expression
  // eval runs concurrently on every task thread. Shared with
  // [[MinGramHash]] (same per-shingle digest discipline).
  private[plans] val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** One pass over the document: per character n-gram, md5 → first 7
    * bytes as an unsigned 56-bit Long, then the k xor/mul/mask
    * derivations, tracking minima. Null when no full-length shingle
    * exists. ASCII documents hash straight out of the backing byte
    * array (no per-shingle substring/copy); multi-byte documents fall
    * back to character-based substrings — identical results, since
    * ASCII bytes ARE the UTF-8 encoding of the character window. */
  def compute(s: UTF8String, n: Int, k: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return null
    val md = md5.get()
    md.reset() // defensive: a prior partial update must not leak in
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val bytes = s.getBytes
    val ascii = bytes.length == numChars
    var i = 0
    while (i <= numChars - n) {
      if (ascii) md.update(bytes, i, n)
      else md.update(s.substring(i, i + n).getBytes)
      val d = md.digest() // resets the digest for the next shingle
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var j = 0
      while (j < k) {
        val v = ((h ^ saltXor(j)) * saltMul(j)) & hashMask
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
