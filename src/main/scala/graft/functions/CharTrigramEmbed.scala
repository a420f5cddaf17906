package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused char-trigram hashed embedding: TEXT in, unit-norm
  * `array<float>` of width `dim` out — one pass over the string, the
  * whole-row kernel under `LangIdTrained.withFeatures*`.
  *
  * Computes EXACTLY the composed formulation
  * `HashEmbedVector(wordNgrams(charSpread(text), 3), dim)` (spec-pinned
  * byte-for-byte against it, both hash modes — the
  * [[HashEmbedVector]]/`hashEmbedReference` pairing): trim + lowercase,
  * whitespace-run collapse to `_` (the `LangIdTrained.SpreadWs` set),
  * `_` padding, then every codepoint window of 3 hashed as the
  * space-joined trigram's UTF-8 bytes. What it deletes from the
  * composed plan: two regexp passes over a 2x-spread copy of the text,
  * a ~chars-sized `split` array, two `zip_with` slice arrays, and one
  * allocated string per trigram — the measured cost center of the
  * scoring pass (AbLangId probe: feature construction, not hashing,
  * dominated). The hash calls are the composed path's own
  * ([[Md5Hash.hash64Bytes]] over identical bytes; `XXH64` seed-42 +
  * chained-7 sign), accumulated into the same integral ±1 slots and the
  * same ascending-index norm fold, so outputs are byte-identical by
  * construction.
  */
case class CharTrigramEmbed(child: Expression, dim: Int,
    md5Mode: Boolean = false)
    extends UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharTrigramEmbed.compute(input.asInstanceOf[UTF8String], dim, md5Mode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.CharTrigramEmbed.compute($in, $dim, $md5Mode);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_char_trigram_embed"
}

object CharTrigramEmbed {

  /** membership in the charSpread collapse set (`LangIdTrained.SpreadWs`
    * — Java `\s` plus NEL/LS/PS; the two constants are spec-pinned
    * against each other) */
  def isSpreadWs(cp: Int): Boolean = cp match {
    case 0x20 | 0x09 | 0x0A | 0x0B | 0x0C | 0x0D | 0x85 | 0x2028 |
        0x2029 => true
    case _ => false
  }

  /** UTF-8-encode `cp` into `buf` at `off`, returning the new offset —
    * the same bytes Spark's concat would produce for the codepoint. */
  private def writeCp(buf: Array[Byte], off: Int, cp: Int): Int = {
    if (cp < 0x80) { buf(off) = cp.toByte; off + 1 }
    else if (cp < 0x800) {
      buf(off) = (0xc0 | (cp >> 6)).toByte
      buf(off + 1) = (0x80 | (cp & 0x3f)).toByte
      off + 2
    } else if (cp < 0x10000) {
      buf(off) = (0xe0 | (cp >> 12)).toByte
      buf(off + 1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
      buf(off + 2) = (0x80 | (cp & 0x3f)).toByte
      off + 3
    } else {
      buf(off) = (0xf0 | (cp >> 18)).toByte
      buf(off + 1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
      buf(off + 2) = (0x80 | ((cp >> 6) & 0x3f)).toByte
      buf(off + 3) = (0x80 | (cp & 0x3f)).toByte
      off + 4
    }
  }

  /** one-pass kernel body (static so codegen emits a single call) */
  def compute(s: UTF8String, dim: Int, md5Mode: Boolean): UnsafeArrayData = {
    val str = s.trim().toLowerCase().toString
    // boundary-marked codepoint stream: '_' + collapse(SpreadWs -> '_') + '_'
    val cps = new Array[Int](str.length + 2)
    var m = 0
    cps(m) = '_'; m += 1
    var i = 0
    var inWs = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isSpreadWs(cp)) {
        if (!inWs) { cps(m) = '_'; m += 1; inWs = true }
      } else {
        cps(m) = cp; m += 1; inWs = false
      }
      i += Character.charCount(cp)
    }
    cps(m) = '_'; m += 1
    val acc = new Array[Double](dim)
    if (m >= 3) {
      val buf = new Array[Byte](14) // 3 codepoints (<= 4B each) + 2 spaces
      var w = 0
      while (w + 2 < m) {
        var len = writeCp(buf, 0, cps(w))
        buf(len) = ' '; len += 1
        len = writeCp(buf, len, cps(w + 1))
        buf(len) = ' '; len += 1
        len = writeCp(buf, len, cps(w + 2))
        if (md5Mode) {
          val h = Md5Hash.hash64Bytes(buf, len)
          acc(((h >>> 32) % dim).toInt) +=
            (if ((h & 1L) == 0L) 1.0 else -1.0)
        } else {
          val h1 =
            XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
          val idx = (((h1 % dim) + dim) % dim).toInt
          acc(idx) += (if ((XXH64.hashInt(7, h1) & 1L) == 0L) 1.0 else -1.0)
        }
        w += 1
      }
    }
    var ss = 0.0
    i = 0
    while (i < dim) { ss += acc(i) * acc(i); i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Float](dim)
    if (nrm != 0.0) {
      i = 0
      while (i < dim) { out(i) = (acc(i) / nrm).toFloat; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column entry points; null text coalesces to empty -> the all-zero
    * vector, matching the composed chain's end-to-end null behavior. */
  def embed(text: Column, dim: Int): Column =
    Bridge.column(CharTrigramEmbed(
      Bridge.expression(coalesce(text, lit(""))), dim))

  def embedMd5(text: Column, dim: Int): Column =
    Bridge.column(CharTrigramEmbed(
      Bridge.expression(coalesce(text, lit(""))), dim, md5Mode = true))
}
