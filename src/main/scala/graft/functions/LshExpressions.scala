package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native LSH signature kernels. Both replicate the exact bit-level
  * semantics of the SQL formulations they replace (seeded `xxhash64`
  * accumulation), so signatures — and therefore candidate sets and query
  * outputs — are unchanged; only the evaluation strategy differs.
  */

/** MinHash signature: for each of `numHashes` seeds i, the minimum over
  * the shingle array of `xxhash64(shingle, i)`. Bit-identical to
  * `array_min(transform(sh, s -> xxhash64(s, i)))` per index — Spark's
  * xxhash64 accumulates `hashInt(i, hashUTF8String(s, 42))` — but
  * computed in ONE pass: each shingle's string hash is computed once and
  * the per-seed finisher is a single `hashInt`, instead of re-hashing the
  * string `numHashes` times. For 32 hashes over ~50 shingles that is 50
  * string hashes per row instead of 1,600.
  *
  * An empty input array yields Long.MaxValue minima (the SQL formulation
  * never produces one: `Dedup.shingles` emits at least one element).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      // null elements are skipped (treated as absent from the shingle
      // set), matching SortedIntersectCount's null handling
      if (!arr.isNullAt(j)) {
        val base = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashInt(i, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val (n, j, i, mins, base, hv) = (ctx.freshName("n"), ctx.freshName("j"),
        ctx.freshName("i"), ctx.freshName("mins"), ctx.freshName("base"),
        ctx.freshName("hv"))
      s"""
         |int $n = $in.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) continue;
         |  long $base = $xxh.hashUTF8String($in.getUTF8String($j), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $hv = $xxh.hashInt($i, $base);
         |    if ($hv < $mins[$i]) $mins[$i] = $hv;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** MinHash signature from PRE-HASHED shingles (`array<long>` of
  * `xxhash64(shingle)` values — Spark's default-seed 42 string hash is
  * exactly the `base` of [[MinHashSignature]]): for each seed i the
  * minimum over the array of `hashInt(i, base)`. Produces bit-identical
  * signatures to [[MinHashSignature]] on the corresponding strings, but
  * lets the pipeline carry 8-byte hashes instead of shingle strings —
  * the verify join then shuffles long arrays, not text.
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      // null elements are skipped (treated as absent from the shingle
      // set) — the SQL-registered form accepts containsNull arrays, and
      // reading a null slot as hash value 0 would silently skew minima
      if (!arr.isNullAt(j)) {
        val base = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashInt(i, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val (n, j, i, mins, base, hv) = (ctx.freshName("n"), ctx.freshName("j"),
        ctx.freshName("i"), ctx.freshName("mins"), ctx.freshName("base"),
        ctx.freshName("hv"))
      s"""
         |int $n = $in.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) continue;
         |  long $base = $in.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $hv = $xxh.hashInt($i, $base);
         |    if ($hv < $mins[$i]) $mins[$i] = $hv;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_from_hashes"
}

/** Intersection size of two SORTED `array<long>` columns: a single
  * O(n+m) merge pass over the unsafe arrays — no per-row hash-set build,
  * no boxing (`array_intersect` allocates and hashes per invocation).
  * CONTRACT: inputs must be sorted ascending and duplicate-free (e.g.
  * `sort_array(array_distinct(...))`, as the prepared shingle-hash
  * arrays are by construction) — an unsorted input silently undercounts,
  * exactly like any merge-join fed unsorted runs. Null ELEMENTS are
  * skipped (treated as absent); a null array yields null. The
  * exact-Jaccard verify over candidate pairs is the hot consumer.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val (na, nb, i, j, c, x, y) = (ctx.freshName("na"), ctx.freshName("nb"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $na = $l.numElements();
         |int $nb = $r.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($l.isNullAt($i)) { $i++; }
         |  else if ($r.isNullAt($j)) { $j++; }
         |  else {
         |    long $x = $l.getLong($i);
         |    long $y = $r.getLong($j);
         |    if ($x == $y) { $c++; $i++; $j++; }
         |    else if ($x < $y) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}

/** 64-bit SimHash from an `array<long>` of token hashes: bit b of the
  * result is set when the sum over tokens of (+1/-1 for bit b of the
  * token hash) is positive. Bit-identical to the 64-fold SQL aggregate
  * formulation, evaluated as one primitive pass over the array.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      // null token hashes cast no votes (skipped, not treated as 0)
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val (n, j, b, b2, votes, h, sig) = (ctx.freshName("n"), ctx.freshName("j"),
        ctx.freshName("b"), ctx.freshName("b2"), ctx.freshName("votes"),
        ctx.freshName("h"), ctx.freshName("sig"))
      s"""
         |int $n = $in.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) continue;
         |  long $h = $in.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) {
         |  if ($votes[$b2] > 0) $sig |= (1L << $b2);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** Random-hyperplane LSH bucket codes for one embedding: the signs of the
  * vector's dot products with `planes` (row-major, `tables * planesPerTable`
  * rows of `dim` coefficients), packed per table into a base-2 code —
  * code(t) = sum over p in table t of 2^(remaining) * (dot(planes(p), v) > 0).
  * One primitive pass over the vector per plane, no per-plane array
  * allocation or boxing (the `transform`/`zip_with`/`aggregate`
  * formulation it replaces allocated a zipped array per plane per row and
  * boxed every element).
  *
  * Exact parity with that SQL formulation's null semantics: a vector whose
  * length differs from `dim`, or containing a null element, zips a null
  * into every plane's product, nulling every dot — all bits 0, so every
  * table code is 0 (the row lands in bucket 0 of every table).
  */
case class HyperplaneBuckets(child: Expression,
    flatPlanes: Array[Double], nPlanes: Int, planesPerTable: Int)
    extends UnaryExpression {

  // flatPlanes is a row-major nPlanes x dim matrix held as a FLAT ARRAY
  // deliberately: Catalyst re-hashes and re-compares every expression's
  // constructor args on each of the many tree transforms a multi-stage
  // plan goes through, and a nested IndexedSeq of plane coefficients is
  // deep-hashed every time — O(nPlanes*dim) per touch, measured at
  // multiple SECONDS of pure planning overhead for a 32x256 matrix.
  // Arrays hash/compare by identity: O(1) per touch, and the same
  // instance flows through every copy of this node.
  require(nPlanes > 0 && nPlanes % planesPerTable == 0,
    s"planes ($nPlanes) must be a multiple of planesPerTable ($planesPerTable)")
  require(flatPlanes.length % nPlanes == 0,
    s"flat matrix (${flatPlanes.length}) not divisible by nPlanes ($nPlanes)")

  private val dim = flatPlanes.length / nPlanes
  private val nTables = nPlanes / planesPerTable
  private def flat: Array[Double] = flatPlanes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  // lazy: touching child.dataType at construction time throws on a
  // not-yet-resolved child (the analyzer copies this node via
  // withNewChildInternal before resolution completes)
  @transient private lazy val childIsFloat =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Long](nTables)
    var degenerate = v.numElements() != dim
    if (!degenerate) {
      var i = 0
      while (i < dim && !degenerate) {
        if (v.isNullAt(i)) degenerate = true
        i += 1
      }
    }
    if (!degenerate) {
      val vec = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        vec(i) = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        i += 1
      }
      var p = 0
      while (p < nPlanes) {
        var s = 0.0d
        var j = 0
        val off = p * dim
        while (j < dim) { s += flat(off + j) * vec(j); j += 1 }
        val t = p / planesPerTable
        codes(t) = codes(t) * 2 + (if (s > 0) 1L else 0L)
        p += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val uad = classOf[UnsafeArrayData].getName
      val planesRef = ctx.addReferenceObj("graftPlanes", flat, "double[]")
      val (codes, degen, vec, i, p, j, s, off) = (ctx.freshName("codes"),
        ctx.freshName("degen"), ctx.freshName("vec"), ctx.freshName("i"),
        ctx.freshName("p"), ctx.freshName("j"), ctx.freshName("s"),
        ctx.freshName("off"))
      val getElem =
        if (childIsFloat) s"(double) $in.getFloat($i)" else s"$in.getDouble($i)"
      s"""
         |long[] $codes = new long[$nTables];
         |boolean $degen = $in.numElements() != $dim;
         |if (!$degen) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($in.isNullAt($i)) { $degen = true; break; }
         |  }
         |}
         |if (!$degen) {
         |  double[] $vec = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) { $vec[$i] = $getElem; }
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double $s = 0.0d;
         |    int $off = $p * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += $planesRef[$off + $j] * $vec[$j];
         |    }
         |    $codes[$p / $planesPerTable] =
         |      $codes[$p / $planesPerTable] * 2 + (($s > 0) ? 1L : 0L);
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_buckets"
}

/** Product-quantization encoder: for each of the `m` subspaces, the id of
  * the L2-nearest codeword (ties to the lowest id). One primitive pass —
  * the `least(struct(distance, cid))`-over-`zip_with` SQL formulation it
  * replaces allocates a zipped array per (subspace, codeword) per row.
  * `codebooks(s)(c)` = codeword c of subspace s; every codeword has
  * dim/m components.
  *
  * Requires a clean fixed-dim vector: a row whose vector length differs
  * from the codebooks' total dim, or containing a null element, encodes
  * to NULL (explicit, instead of the SQL formulation's null-padded
  * distance arithmetic silently resolving to codeword 0).
  */
case class PqEncode(child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val dsub = codebooks.head.head.length
  private val dim = m * dsub
  private val ksub = codebooks.map(_.length).max
  require(codebooks.forall(cb => cb.nonEmpty && cb.forall(_.length == dsub)),
    "ragged codebooks")

  // flattened [s][c][j] -> s * ksub * dsub + c * dsub + j; subspaces may
  // have FEWER than ksub codewords (k-means dedupes tiny spaces): pad
  // with +inf distance by tracking per-subspace counts
  @transient private lazy val counts: Array[Int] = codebooks.map(_.length).toArray
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    for (s <- 0 until m; c <- 0 until codebooks(s).length; j <- 0 until dsub)
      a(s * ksub * dsub + c * dsub + j) = codebooks(s)(c)(j)
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  @transient private lazy val childIsFloat =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      vec(i) = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < counts(s)) {
        var d = 0.0d
        var j = 0
        val off = s * ksub * dsub + c * dsub
        while (j < dsub) {
          val diff = vec(s * dsub + j) - flat(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val uad = classOf[UnsafeArrayData].getName
      val cbRef = ctx.addReferenceObj("graftPqCodebooks", flat, "double[]")
      val cntRef = ctx.addReferenceObj("graftPqCounts", counts, "int[]")
      val (vec, codes, bad, i, s, c, j, d, diff, best, bestD, off) =
        (ctx.freshName("vec"), ctx.freshName("codes"), ctx.freshName("bad"),
          ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("c"),
          ctx.freshName("j"), ctx.freshName("d"), ctx.freshName("diff"),
          ctx.freshName("best"), ctx.freshName("bestD"), ctx.freshName("off"))
      val getElem =
        if (childIsFloat) s"(double) $in.getFloat($i)" else s"$in.getDouble($i)"
      s"""
         |boolean $bad = $in.numElements() != $dim;
         |double[] $vec = null;
         |if (!$bad) {
         |  $vec = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($in.isNullAt($i)) { $bad = true; break; }
         |    $vec[$i] = $getElem;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $cntRef[$s]; $c++) {
         |      double $d = 0.0d;
         |      int $off = $s * $ksub * $dsub + $c * $dsub;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        double $diff = $vec[$s * $dsub + $j] - $cbRef[$off + $j];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

/** Nearest-centroid (IVF cell) assignment: the id of the centroid with the
  * greatest cosine similarity to the vector, computed as the argmax of
  * dot(vec, unit(centroid)) — the row vector's own norm is a positive
  * constant across centroids and cannot change the argmax, so the
  * centroid rows are unit-normalized ONCE at construction and each row
  * pays k·dim multiply-adds in one primitive pass.
  *
  * This replaces the `greatest(struct(cosine, cid) × k)` column formula,
  * whose expression tree (k × dim array literals, k dot products + 2k
  * norms) made janino compile a multi-second method for EVERY stage that
  * evaluated the cell column — the plan-compile time, not the arithmetic,
  * dominated the IVF and semantic-dedup pipelines.
  *
  * Parity with that formulation: a vector of the wrong length or with a
  * null element gets a NULL cell (null scores there, null greatest here);
  * an exact score tie goes to the larger centroid id (struct comparison
  * order). A zero vector scores 0 against every centroid and likewise
  * lands in the last cell (NaN-cosines all compare equal under
  * `greatest`'s NaN-as-largest ordering). A vector containing NaN is
  * DEGENERATE here — every dot product is NaN, so no cell is meaningful —
  * and gets a NULL cell like the null-element case (this deliberately
  * diverges from `greatest`'s NaN-as-largest accident, which silently
  * assigned such vectors to the last cell).
  */
case class NearestCentroid(child: Expression,
    flatCentroids: Array[Double], k: Int)
    extends UnaryExpression {

  // flatCentroids = RAW row-major k x dim matrix as a FLAT ARRAY — same
  // rationale as [[HyperplaneBuckets]]: Catalyst deep-hashes nested-Seq
  // constructor args on every tree transform (O(k*dim) per touch,
  // seconds of planning at a production cell count); arrays hash by
  // identity.
  require(k > 0, "need at least one centroid")
  require(flatCentroids.length % k == 0 && flatCentroids.length > 0,
    s"flat matrix (${flatCentroids.length}) not divisible by k ($k)")
  private val dim = flatCentroids.length / k

  // unit-normalized row-major copy (zero-norm rows stay zero: dot = 0)
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      var n2 = 0.0d
      var j = 0
      while (j < dim) { val x = flatCentroids(c * dim + j); n2 += x * x; j += 1 }
      val inv = if (n2 == 0.0d) 0.0d else 1.0d / math.sqrt(n2)
      j = 0
      while (j < dim) { a(c * dim + j) = flatCentroids(c * dim + j) * inv; j += 1 }
      c += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  @transient private lazy val childIsFloat =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      vec(i) = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (vec(i).isNaN) return null
      i += 1
    }
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var s = 0.0d
      val off = c * dim
      var j = 0
      while (j < dim) { s += flat(off + j) * vec(j); j += 1 }
      if (s >= bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val centsRef = ctx.addReferenceObj("graftCentroids", flat, "double[]")
      val (vec, i, c, j, s, off, best, bestS, degen) = (ctx.freshName("vec"),
        ctx.freshName("i"), ctx.freshName("c"), ctx.freshName("j"),
        ctx.freshName("s"), ctx.freshName("off"), ctx.freshName("best"),
        ctx.freshName("bestS"), ctx.freshName("degen"))
      val getElem =
        if (childIsFloat) s"(double) $in.getFloat($i)" else s"$in.getDouble($i)"
      s"""
         |boolean $degen = $in.numElements() != $dim;
         |double[] $vec = new double[$dim];
         |if (!$degen) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($in.isNullAt($i)) { $degen = true; break; }
         |    $vec[$i] = $getElem;
         |    if (Double.isNaN($vec[$i])) { $degen = true; break; }
         |  }
         |}
         |if ($degen) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $s = 0.0d;
         |    int $off = $c * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += $centsRef[$off + $j] * $vec[$j];
         |    }
         |    if ($s >= $bestS) { $bestS = $s; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroid"
}

object LshExpressions {
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dims = centroids.map(_.length).distinct
    require(dims.length == 1,
      s"all centroids must share the vector dimensionality, got $dims")
    Bridge.column(NearestCentroid(Bridge.expression(vec),
      centroids.flatten.toArray, centroids.length))
  }

  def minhashSignature(sh: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(sh), numHashes))

  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashFromHashes(Bridge.expression(hashes), numHashes))

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))

  def hyperplaneBuckets(vec: Column, planes: Seq[Seq[Double]],
      planesPerTable: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec),
      planes.flatten.toArray, planes.length, planesPerTable))

  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec),
      codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** Deterministic random-hyperplane matrix: `nPlanes` rows of `dim`
    * standard-normal coefficients from a fixed-seed JDK RNG (a specified
    * algorithm — identical across JVMs, runs, and cluster sizes). Shared
    * by the cosine near-dup pipeline and LSH top-k so an index built by
    * one is probeable by the other.
    */
  def planeMatrix(dim: Int, nPlanes: Int,
      seed: Long): IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(nPlanes)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
  }

  /** Driver-side bucket codes of one vector against `planes` — the exact
    * packing [[HyperplaneBuckets]] computes per row (for probing: the
    * query's codes are computed here, the corpus's by the kernel).
    */
  def bucketCodesOf(v: Seq[Double], planes: IndexedSeq[IndexedSeq[Double]],
      planesPerTable: Int): IndexedSeq[Long] =
    (0 until planes.length / planesPerTable).map { t =>
      (0 until planesPerTable).foldLeft(0L) { (acc, p) =>
        val plane = planes(t * planesPerTable + p)
        var s = 0.0d
        var i = 0
        while (i < plane.length && i < v.length) { s += plane(i) * v(i); i += 1 }
        val bit = if (v.length == plane.length && s > 0) 1L else 0L
        acc * 2 + bit
      }
    }
}
