package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom aggregation functions — the UDAF surface.
  *
  *  - [[BitmapDistinct]]: EXACT distinct count of bounded non-negative
  *    ids via a fixed-width bitmap buffer. Mergeable by bitwise OR, so it
  *    is fully map-side combinable and order-independent (deterministic —
  *    oracle-checkable against COUNT(DISTINCT)), and the buffer is
  *    maxId/8 bytes regardless of row count: for key spaces like supplier
  *    or part ids this beats a shuffle of the distinct values.
  *  - [[HeavyHittersAgg]]: Misra-Gries frequent-items summary over strings
  *    (e.g. tokens): any item occurring more than n/(k+1) times is
  *    guaranteed present in the output. Counts are lower bounds and the
  *    retained tail can vary with merge order (the standard trade of
  *    mergeable heavy-hitter sketches); the guarantee is what the spec
  *    asserts. A native `TypedImperativeAggregate`: the buffer is ONE
  *    mutable hash map object held across the whole partition and
  *    serialized only at shuffle boundaries — a typed `Aggregator` with a
  *    `Map` buffer would round-trip the map through the encoder on every
  *    input row (O(k) serialization per row).
  */
object Aggregators {

  final case class BitmapDistinct(maxId: Int)
      extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long]((maxId >> 6) + 1)
    override def reduce(b: Array[Long], a: Long): Array[Long] = {
      if (a >= 0 && a <= maxId) b((a >> 6).toInt) |= 1L << (a & 63)
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Long =
      b.map(w => java.lang.Long.bitCount(w).toLong).sum
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column function: exact distinct count of a long column with ids in
    * [0, maxId].
    */
  def bitmapDistinct(c: Column, maxId: Int): Column =
    udaf(BitmapDistinct(maxId), Encoders.scalaLong).apply(c)

  /** Misra-Gries heavy hitters as a native imperative aggregate.
    * Output: `array<struct<term string, n long>>`, sorted by descending
    * (lower-bound) count then term. At most `k` counters are retained;
    * overflow decrements every counter by the minimum and drops zeros —
    * the classic summary with the n/(k+1) presence guarantee.
    */
  final case class HeavyHittersAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

    require(k > 0, "heavyHitters needs k > 0")

    override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
      mutable.HashMap.empty

    /** Add `c` occurrences of `s`. `copyKey` guards against storing a
      * UTF8String that points into a reused unsafe-row buffer (input rows
      * are only valid for the duration of the update call).
      */
    private def add(m: mutable.HashMap[UTF8String, Long], s: UTF8String,
        c: Long, copyKey: Boolean): Unit = {
      m.get(s) match {
        case Some(n) => m.update(s, n + c)
        case None =>
          m.update(if (copyKey) s.clone() else s, c)
          if (m.size > k) {
            val d = m.valuesIterator.min
            val kept = m.iterator.collect {
              case (key, n) if n > d => key -> (n - d)
            }.toArray
            m.clear()
            kept.foreach { case (key, n) => m.update(key, n) }
          }
      }
    }

    override def update(m: mutable.HashMap[UTF8String, Long],
        input: InternalRow): mutable.HashMap[UTF8String, Long] = {
      val v = child.eval(input)
      if (v != null) add(m, v.asInstanceOf[UTF8String], 1L, copyKey = true)
      m
    }

    override def merge(m: mutable.HashMap[UTF8String, Long],
        other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
      // keys from the absorbed buffer are heap-owned (deserialized or
      // built by update's clone) — no copy needed
      other.foreach { case (s, c) => add(m, s, c, copyKey = false) }
      m
    }

    override def eval(m: mutable.HashMap[UTF8String, Long]): Any = {
      val sorted = m.toArray.sortWith { case ((sa, ca), (sb, cb)) =>
        ca > cb || (ca == cb && sa.compareTo(sb) < 0)
      }
      new GenericArrayData(sorted.map { case (s, c) => InternalRow(s, c) })
    }

    override def serialize(m: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(m.size)
      m.foreach { case (s, c) =>
        val b = s.getBytes
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val m = mutable.HashMap.empty[UTF8String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        m.update(UTF8String.fromBytes(b), in.readLong())
        i += 1
      }
      m
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("term", StringType), StructField("n", LongType))),
      containsNull = false)

    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
      copy(mutableAggBufferOffset = newOffset)

    override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
      copy(inputAggBufferOffset = newOffset)

    override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
      copy(child = newChild)

    override def prettyName: String = "graft_heavy_hitters"
  }

  /** Column function: top-k frequent items of a string column
    * (array<struct<term, n>>, counts are Misra-Gries lower bounds).
    */
  def heavyHitters(c: Column, k: Int): Column =
    Bridge.column(HeavyHittersAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Bounded min-heap of the k best (score, id) pairs: best = highest
    * score, ties to the LOWEST id — a total order, so the result is
    * deterministic under any update/merge interleaving. Array-backed:
    * no per-row allocation in the aggregation hot path.
    */
  final class TopKHeap(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var n = 0
    // (sa, ia) strictly worse than (sb, ib)
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)
    @inline private def swap(i: Int, j: Int): Unit = {
      val s = scores(i); scores(i) = scores(j); scores(j) = s
      val d = ids(i); ids(i) = ids(j); ids(j) = d
    }
    def add(s: Double, id: Long): Unit =
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1
        var i = n - 1
        while (i > 0 && worse(scores(i), ids(i), scores((i - 1) >> 1), ids((i - 1) >> 1))) {
          swap(i, (i - 1) >> 1); i = (i - 1) >> 1
        }
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          var m = i
          if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
          if (l + 1 < n && worse(scores(l + 1), ids(l + 1), scores(m), ids(m))) m = l + 1
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    /** Entries best-first. */
    def sortedDesc: Array[(Double, Long)] = {
      val a = Array.tabulate(n)(i => (scores(i), ids(i)))
      a.sortWith { case ((sa, ia), (sb, ib)) => sa > sb || (sa == sb && ia < ib) }
    }
  }

  /** Top-k (score, id) pairs as a native imperative aggregate — the
    * distributed-top-k building block behind [[graft.operators.Similarity.knnJoin]].
    * Partial aggregation keeps a k-entry heap per group map-side, so only
    * k pairs per (partition, group) ever cross the shuffle — the
    * alternative `row_number` window shuffles EVERY scored row. NULL
    * scores and ids are skipped (a NULL cosine = a zero vector: no
    * direction, no vote). Output: `array<struct<score double, id long>>`,
    * best-first, deterministic (ties to the lowest id).
    */
  final case class TopKPairsAgg(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

    require(k > 0, "topKPairs needs k > 0")

    override def left: Expression = score
    override def right: Expression = id

    // analysis-time contract: a decimal or string score would otherwise
    // ClassCastException mid-job on the executors
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      val scoreOk = score.dataType match {
        case DoubleType | FloatType | IntegerType | LongType |
             ShortType | ByteType => true
        case _ => false
      }
      val idOk = id.dataType match {
        case IntegerType | LongType | ShortType | ByteType => true
        case _ => false
      }
      if (scoreOk && idOk) TypeCheckSuccess
      else TypeCheckFailure(s"$prettyName requires a non-decimal numeric " +
        s"score and an integral id, got ${score.dataType.sql}, ${id.dataType.sql}")
    }

    override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

    override def update(h: TopKHeap, input: InternalRow): TopKHeap = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        val d = s.asInstanceOf[Number].doubleValue()
        // a NaN compares false both ways in worse(): admitted once it would
        // lodge at the root and veto every later insertion — no vote, like
        // NULL
        if (!d.isNaN) h.add(d, i.asInstanceOf[Number].longValue())
      }
      h
    }

    override def merge(h: TopKHeap, other: TopKHeap): TopKHeap = {
      var i = 0
      while (i < other.n) { h.add(other.scores(i), other.ids(i)); i += 1 }
      h
    }

    override def eval(h: TopKHeap): Any =
      new GenericArrayData(h.sortedDesc.map { case (s, i) => InternalRow(s, i) })

    override def serialize(h: TopKHeap): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(h.n)
      var i = 0
      while (i < h.n) { out.writeDouble(h.scores(i)); out.writeLong(h.ids(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): TopKHeap = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val h = new TopKHeap(k)
      var i = 0
      while (i < n) { h.add(in.readDouble(), in.readLong()); i += 1 }
      h
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
      containsNull = false)

    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
      copy(mutableAggBufferOffset = newOffset)

    override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
      copy(inputAggBufferOffset = newOffset)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopKPairsAgg =
      copy(score = newLeft, id = newRight)

    override def prettyName: String = "graft_topk_pairs"
  }

  /** Column function: the k highest-scoring (score, id) pairs of a group
    * (`array<struct<score, id>>`, best-first, ties to the lowest id).
    */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairsAgg(Bridge.expression(score),
      Bridge.expression(id), k).toAggregateExpression())
}
