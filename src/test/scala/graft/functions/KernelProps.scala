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

  private val vecGen: Gen[List[Double]] =
    Gen.chooseNum(0, 0).flatMap(_ => Gen.listOfN(6,
      Gen.chooseNum(-4.0, 4.0).map(x => math.rint(x * 8) / 8)))

  property("NearestCentroid == driver argmax cosine on random vectors/matrices") =
    forAll(vecGen, Gen.chooseNum(2, 5).flatMap(k => Gen.listOfN(k, vecGen))) {
      (v, cents0) =>
      import spark.implicits._
      // drop zero-norm centroids from the comparison domain edge: cosine
      // is undefined there and the kernel documents dot-with-zero = 0
      val cents = cents0.map(c => if (c.forall(_ == 0.0)) c.updated(0, 1.0) else c)
      val got = Seq(Tuple1(v)).toDF("v")
        .select(LshExpressions.nearestCentroid($"v", cents)).collect()(0).getInt(0)
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map(p => p._1 * p._2).sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na == 0 || nb == 0) 0.0 else d / (na * nb)
      }
      // driver argmax with the kernel's larger-index tie-break; near-ties
      // are discarded (kernel normalizes centroids once, driver divides —
      // ulp-level disagreement is legitimate there)
      val scores = cents.map(c => cos(v, c))
      val want = scores.zipWithIndex.maxBy { case (s, i) => (s, i) }._2
      val top2 = scores.sorted.reverse.take(2)
      val clear = v.forall(_ == 0.0) || top2.length < 2 ||
        (top2.head - top2(1)) > 1e-9
      import org.scalacheck.Prop.propBoolean
      // all-zero input: every score ties -> last index (documented)
      clear ==> (if (v.forall(_ == 0.0)) got == cents.length - 1
        else got == want)
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
