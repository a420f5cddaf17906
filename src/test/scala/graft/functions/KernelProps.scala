package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.core.SparkTestSession

/** Property suites for the native kernels: the merge-intersection and
  * hashed-signature expressions must agree with reference computations on
  * arbitrary inputs, not just the fixture corpus.
  */
class KernelProps extends Properties("Kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  lazy val spark: SparkSession = SparkTestSession.get

  private val longSet: Gen[List[Long]] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))).map(_.distinct.sorted)

  property("SortedIntersectCount == Set.intersect size on random sorted sets") =
    forAll(longSet, longSet) { (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(LshExpressions.sortedIntersectCount(
        $"a".cast("array<long>"), $"b".cast("array<long>"))).collect()(0).getInt(0)
      got == a.toSet.intersect(b.toSet).size
    }

  private val words: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 30).map(i => s"w$i")))

  property("MinHashFromHashes(xxhash64(sh)) == MinHashSignature(sh) on random arrays") =
    forAll(words) { sh =>
      import spark.implicits._
      val df = Seq(Tuple1(sh)).toDF("sh")
      val rows = df.select(
        LshExpressions.minhashSignature($"sh", 8).as("a"),
        LshExpressions.minhashFromHashes(
          transform($"sh", s => xxhash64(s)), 8).as("b")).collect()(0)
      rows.getSeq[Long](0) == rows.getSeq[Long](1)
    }

  property("TopKHeap under random splits/merges == sort-based reference") =
    forAll(
      Gen.chooseNum(1, 8),
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(0L, 20L)))),
      Gen.chooseNum(1, 5)) { (k, pairs, nSplits) =>
      // merge partial heaps built from arbitrary chunks of the stream
      val partials = pairs.grouped(math.max(1, pairs.length / nSplits)).map { chunk =>
        val h = new Aggregators.TopKHeap(k)
        chunk.foreach { case (s, i) => h.add(s, i) }
        h
      }.toList
      val merged = partials.headOption.getOrElse(new Aggregators.TopKHeap(k))
      partials.drop(1).foreach { other =>
        (0 until other.n).foreach(i => merged.add(other.scores(i), other.ids(i)))
      }
      val got = merged.sortedDesc.toSeq
      // reference: global sort, best = (score desc, id asc), duplicates kept
      val want = pairs.sortWith { case ((sa, ia), (sb, ib)) =>
        sa > sb || (sa == sb && ia < ib)
      }.take(k)
      got == want
    }

  property("jaccardOfHashes is symmetric, in [0,1], and 1 on equal sets") =
    forAll(words, words) { (sa, sb) =>
      import spark.implicits._
      import graft.operators.Dedup
      val (ta, tb) = (sa.mkString(" "), sb.mkString(" "))
      val df = Seq((ta, tb)).toDF("ta", "tb")
      val r = df.select(
        Dedup.jaccard($"ta", $"ta", k = 1).as("same"),
        Dedup.jaccard($"ta", $"tb", k = 1).as("ab"),
        Dedup.jaccard($"tb", $"ta", k = 1).as("ba")).collect()(0)
      val expected = sa.toSet.intersect(sb.toSet).size.toDouble /
        sa.toSet.union(sb.toSet).size
      r.getDouble(0) == 1.0 && r.getDouble(1) == r.getDouble(2) &&
        r.getDouble(1) == expected
    }
}
