package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingle hasher: text in, sorted duplicate-free
  * `array<long>` of word-k-shingle `xxhash64` values out — the per-row
  * kernel under [[graft.operators.Dedup.shingleHashes]], the prep stage
  * of the whole minhash/LSH dedup family.
  *
  * The relational formulation (`sort_array(array_distinct(transform(
  * shingles(text, k), xxhash64)))`, with `shingles` itself a lower →
  * trim → regex split → k-1 chained `zip_with` concats) materializes a
  * lowered string copy, a token array, k-1 intermediate shingle arrays,
  * and a boxed long array per row. This expression does one pass over
  * the UTF-8 bytes: manual ASCII-whitespace tokenization (multi-byte
  * code points never contain ASCII bytes, so byte-level splitting is
  * UTF-8-safe), shingle hashes computed over token bytes joined by
  * 0x20 in a reused buffer — the exact UTF-8 encoding of the string
  * concat — then primitive sort + in-place dedup.
  *
  * Bit-compatibility contract (spec-pinned against the retained
  * relational reference): lowercasing and trimming call the same
  * `UTF8String` methods as Spark's `lower`/`trim`; tokenization
  * replicates `split(s, "\\s+", -1)` exactly (Java `\s` =
  * `[ \t\n\x0B\f\r]`; a leading separator run yields an empty first
  * token, a trailing run an empty last token, an empty string one
  * empty token); shingles join k consecutive tokens with a single
  * space, with the all-tokens-joined fallback when a document has
  * fewer than k tokens, exactly `shingles(text, k)`; hashes are
  * `XXH64` over the identical bytes with Spark's seed 42. Null text:
  * the relational chain maps null to `[xxhash64("")]` (legacy
  * `size(null) = -1` fires the fewer-than-k branch and `concat_ws`
  * swallows the null array), which is exactly the empty-string result —
  * the Column wrapper coalesces null to `""` to match.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.ShingleHashes$$.MODULE$$.compute($in, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** The kernel; called from interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): UnsafeArrayData =
    hashedShingles(text, k, md5 = false)

  /** [[Md5ShingleHashes]]' kernel: identical tokenize/join pass, md5
    * halves packed per shingle instead of seeded XXH64. */
  def computeMd5(text: UTF8String, k: Int): UnsafeArrayData =
    hashedShingles(text, k, md5 = true)

  private def hashedShingles(
      text: UTF8String, k: Int, md5: Boolean): UnsafeArrayData = {
    val bytes = text.toLowerCase.trim.getBytes
    val len = bytes.length
    // token boundaries, replicating split(s, "\s+", -1): fields between
    // separator runs, keeping the leading/trailing empties Java keeps
    var nTok = 0
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    def addField(a: Int, b: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = a; ends(nTok) = b; nTok += 1
    }
    var prev = 0
    var i = 0
    while (i < len) {
      if (isSep(bytes(i))) {
        addField(prev, i) // field before this separator run
        while (i < len && isSep(bytes(i))) i += 1
        prev = i
      } else i += 1
    }
    addField(prev, len) // final field (empty after a trailing run)
    // shingle hash loop over a reused join buffer
    val nSh = if (nTok < k) 1 else nTok - k + 1
    val width = if (nTok < k) nTok else k
    val hashes = new Array[Long](nSh)
    var buf = new Array[Byte](64)
    var s = 0
    while (s < nSh) {
      var blen = 0
      var t = s
      val tEnd = s + width
      while (t < tEnd) {
        val tokLen = ends(t) - starts(t)
        val need = blen + tokLen + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (t > s) { buf(blen) = 0x20; blen += 1 }
        System.arraycopy(bytes, starts(t), buf, blen, tokLen)
        blen += tokLen
        t += 1
      }
      hashes(s) =
        if (md5) Md5Hash.hash64Bytes(buf, blen)
        else XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, blen, 42L)
      s += 1
    }
    // sort + in-place dedup = sort_array(array_distinct(...)) on longs
    java.util.Arrays.sort(hashes)
    var out = 0
    var j = 0
    while (j < nSh) {
      if (j == 0 || hashes(j) != hashes(j - 1)) {
        hashes(out) = hashes(j); out += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == nSh) hashes else java.util.Arrays.copyOf(hashes, out))
  }

  /** Column-level entry point. Null text coalesces to `""` — see the
    * null contract in the class doc.
    */
  def shingleHashes(text: Column, k: Int): Column =
    Bridge.column(ShingleHashes(
      Bridge.expression(org.apache.spark.sql.functions.coalesce(
        text, org.apache.spark.sql.functions.lit(""))), k))
}

/** Packed per-shingle md5 halves, one pass: for each word-k-shingle the
  * value `(conv(substring(md5(sh),1,8),16,10) << 32) |
  * conv(substring(md5(sh),9,8),16,10)` — the EXACT two hex halves every
  * md5-twin pipeline slices — computed from the digest bytes directly
  * (no 32-char hex render, no per-half string parse, no intermediate
  * shingle-string arrays), then sorted + deduplicated. Downstream
  * derives `a = h >>> 32` and `b = h & 0xffffffff` by shift/mask.
  *
  * Dedup on the PACKED value is semantics-preserving for both
  * consumers: affine-minhash minima are unchanged by duplicate removal,
  * and the `sh` verify sets re-distinct the projected `a` halves. The
  * legacy relational staging is retained as the bit-parity reference
  * ([[graft.operators.Dedup.minhashIndexMd5Reference]], spec-pinned).
  */
case class Md5ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.computeMd5(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.ShingleHashes$$.MODULE$$.computeMd5($in, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_shingle_hashes"
}

/** Scalar packed md5 halves of one string (the per-TOKEN hash of the
  * simhash md5 twin): hi half = first 8 md5 hex chars as unsigned,
  * lo half = next 8, in one digest pass via [[Md5Hash.hash64]].
  */
case class Md5Hash64Col(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Hash.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Md5Hash.hash64($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_hash64"
}

/** md5-twin affine-MinHash signature from PACKED md5-half hashes (the
  * [[Md5ShingleHashes]] output): one pass over the array computes all
  * `numHashes` minima of `(hi(x) + i·lo(x)) mod 2^32` — the native
  * fusion of the relational
  * `transform(sequence(0, h-1), i -> array_min(transform(h64, ...)))`
  * staging, which allocated `numHashes` intermediate arrays per row.
  * The per-seed value is computed incrementally (`v += lo; v &= mask`),
  * so the inner loop is one add/mask/compare per (element, seed). Null
  * elements are skipped exactly as `array_min` skips nulls; an input
  * with no usable element yields the all-null signature the relational
  * form produces. Bit-identical to the retained relational reference
  * (Md5KernelParitySpec pins it through
  * [[graft.operators.Dedup.minhashIndexMd5Reference]]).
  */
case class Md5MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  // containsNull: the degenerate no-usable-element input produces the
  // all-null signature, matching array_min over an empty array
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    Md5MinHashSig.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Md5MinHashSig$$.MODULE$$" +
        s".compute($in, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_minhash_sig"
}

object Md5MinHashSig {

  /** The kernel; called from interpreted eval and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      h: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val mins = Array.fill(h)(Long.MaxValue)
    var seen = false
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val x = arr.getLong(j)
        val lo = x & 0xffffffffL
        // v = (hi + i*lo) mod 2^32, maintained incrementally
        var v = x >>> 32
        var i = 0
        while (i < h) {
          if (v < mins(i)) mins(i) = v
          v = (v + lo) & 0xffffffffL
          i += 1
        }
      }
      j += 1
    }
    if (!seen)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](h)(null))
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

object Md5Hashes {

  /** Null text coalesces to `""`, matching the relational twins'
    * `coalesce(text, '')`. */
  def md5ShingleHashes(text: Column, k: Int): Column =
    Bridge.column(Md5ShingleHashes(
      Bridge.expression(org.apache.spark.sql.functions.coalesce(
        text, org.apache.spark.sql.functions.lit(""))), k))

  def md5Hash64(s: Column): Column =
    Bridge.column(Md5Hash64Col(Bridge.expression(s)))

  /** All `h` affine-minhash minima from packed md5 halves in one native
    * pass (see [[Md5MinHashSig]]). */
  def md5MinHashSig(h64: Column, h: Int): Column =
    Bridge.column(Md5MinHashSig(Bridge.expression(h64), h))
}
