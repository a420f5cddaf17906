package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.core.SparkTestSession

/** Property suite for the as-of join: both directions must agree with a
  * driver-side reference implementation on random tables, including NULL
  * keys, NULL timestamps, and left rows with no match. Right timestamps
  * are unique per key (at exact ties the matched row among equals is
  * unspecified, in this engine and in the DuckDB oracle alike).
  */
class AsOfJoinProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  lazy val spark: SparkSession = SparkTestSession.get

  private val optKey: Gen[Option[Long]] =
    Gen.frequency(5 -> Gen.chooseNum(0L, 2L).map(Some(_)), 1 -> Gen.const(None))
  private val optTime: Gen[Option[Long]] =
    Gen.frequency(6 -> Gen.chooseNum(0L, 30L).map(Some(_)), 1 -> Gen.const(None))

  private val leftGen: Gen[List[(Long, Option[Long], Option[Long])]] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.sequence[List[(Long, Option[Long], Option[Long])], (Long, Option[Long], Option[Long])](
      (0 until n).map(i => Gen.zip(Gen.const(i.toLong), optKey, optTime))))

  private val rightGen: Gen[List[(Option[Long], Option[Long], Int)]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.sequence[List[(Option[Long], Option[Long], Int)], (Option[Long], Option[Long], Int)](
      (0 until n).map(i => Gen.zip(optKey, optTime, Gen.const(i)))))

  private def dedupeTimes(rs: List[(Option[Long], Option[Long], Int)]) =
    rs.groupBy(r => (r._1, r._2)).collect {
      case ((k, t), group) if t.isEmpty || group.size >= 1 => group.head
    }.toList // unique (key, time) pairs: ties are unspecified by contract

  property("backward and forward match the driver-side reference") =
    forAll(leftGen, rightGen) { (ls, rs0) =>
      import spark.implicits._
      val rs = dedupeTimes(rs0)
      val left = ls.toDF("id", "k", "lt")
      val right = rs.toDF("k", "rt", "a")
      def reference(forward: Boolean): Map[Long, Option[Int]] =
        ls.map { case (id, k, lt) =>
          id -> (for {
            kk <- k
            t <- lt
            best <- {
              val cands = rs.filter(r => r._1.contains(kk) && r._2.isDefined &&
                (if (forward) r._2.get >= t else r._2.get <= t))
              if (cands.isEmpty) None
              else Some(if (forward) cands.minBy(_._2.get) else cands.maxBy(_._2.get))
            }
          } yield best._3)
        }.toMap
      def run(forward: Boolean, native: Boolean): Map[Long, Option[Int]] = {
        val out =
          if (native) AsOfJoin.native(left, right, Seq("k"), "lt", "rt",
            Map("p" -> "a"), forward = forward)
          else if (forward) AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Map("p" -> "a"))
          else AsOfJoin(left, right, Seq("k"), "lt", "rt", Map("p" -> "a"))
        out.collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
      }
      Seq(false, true).forall { fwd =>
        val ref = reference(fwd)
        run(fwd, native = false) == ref && run(fwd, native = true) == ref
      }
    }
}
