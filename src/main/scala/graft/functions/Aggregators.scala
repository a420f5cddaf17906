package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed Aggregators (`functions.udaf`) — the UDAF surface.
  *
  *  - [[BitmapDistinct]]: EXACT distinct count of bounded non-negative
  *    ids via a fixed-width bitmap buffer. Mergeable by bitwise OR, so it
  *    is fully map-side combinable and order-independent (deterministic —
  *    oracle-checkable against COUNT(DISTINCT)), and the buffer is
  *    maxId/8 bytes regardless of row count: for key spaces like supplier
  *    or part ids this beats a shuffle of the distinct values.
  *  - [[HeavyHitters]]: Misra-Gries frequent-items summary over strings
  *    (e.g. tokens): any item occurring more than n/(k+1) times is
  *    guaranteed present in the output. Counts are lower bounds and the
  *    retained tail can vary with merge order (the standard trade of
  *    mergeable heavy-hitter sketches); the guarantee is what the spec
  *    asserts.
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

  final case class HeavyHitters(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty
    private def add(m: Map[String, Long], s: String, c: Long): Map[String, Long] = {
      val m2 = m.updated(s, m.getOrElse(s, 0L) + c)
      if (m2.size <= k) m2
      else {
        val d = m2.values.min
        m2.collect { case (key, n) if n > d => key -> (n - d) }
      }
    }
    override def reduce(m: Map[String, Long], s: String): Map[String, Long] =
      add(m, s, 1L)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (s, c)) => add(m, s, c) }
    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (s, c) => (-c, s) }
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Column function: top-k frequent items of a string column. */
  def heavyHitters(c: Column, k: Int): Column =
    udaf(HeavyHitters(k), Encoders.STRING).apply(c)
}
