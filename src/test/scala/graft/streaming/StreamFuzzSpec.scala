package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.SparkTestSession

/** Randomized differential properties for the stateful streaming
  * operators, complementing StreamingSpec's fixed cases the way
  * TaskGraphFuzzSpec complements the graph example specs: many seeded
  * corpora, each checked against an INDEPENDENT driver-side fold that
  * shares no machinery with the engine (the dedup reference below
  * re-implements the bucket scan from the operator's documented
  * contract; the top-k reference implements Misra-Gries from the
  * paper's rule, not via StreamTopK.mgStep).
  *
  * Deliberately randomized surfaces the fixed specs cannot reach:
  *  - event-time COLLISIONS (ties broken by id/term in the engine's
  *    in-invocation sort — a wrong tie-break diverges here),
  *  - small maxBucket caps (stored-set truncation interacting with the
  *    first-match rule),
  *  - thresholds at 0.25/0.5/0.75 (the >= boundary on the positional
  *    agreement, exercised on near-dup signatures),
  *  - BOTH hash modes of StreamDedup (the md5 oracle twin and the
  *    xxhash64 production kernels run the same state rule).
  */
class StreamFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  /** ids 0..n-1, event-time seconds drawn from a range ~n wide (ties
    * likely), text drawn as exact-dup / one-token-mutant / fresh-random
    * over a small base pool so buckets genuinely collide. */
  private def randomCorpus(rnd: Random, n: Int): Seq[(Long, Long, String)] = {
    val vocab = Vector.tabulate(60)(i => s"w$i")
    def fresh(): String =
      Vector.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Vector.fill(math.max(2, n / 4))(fresh())
    (0 until n).map { i =>
      val tsSec = 10000L + rnd.nextInt(math.max(2, n / 2))
      val text = rnd.nextInt(4) match {
        case 0 => base(rnd.nextInt(base.size))
        case 1 =>
          val t = base(rnd.nextInt(base.size)).split(" ").toVector
          t.updated(rnd.nextInt(t.size),
            vocab(rnd.nextInt(vocab.size))).mkString(" ")
        case _ => fresh()
      }
      (i.toLong, tsSec * 1000L, text)
    }
  }

  /** Independent fold of the documented contract: per (band, chunk)
    * bucket in (tsMs, id) order, flag against the EARLIEST stored
    * signature agreeing on >= threshold of positions, append while the
    * bucket holds < maxBucket signatures. Buckets key on the raw chunk
    * values (the engine keys on a hash of them — equality is the same
    * relation absent 64-bit collisions). */
  private def dedupReference(sigs: Seq[(Long, Long, Seq[Long])],
      bands: Int, rpb: Int, threshold: Double,
      maxBucket: Int): Set[(Long, Long, Double)] = {
    val h = bands * rpb
    val out = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val bandRows = for {
      (id, tsMs, sig) <- sigs
      b <- 0 until bands
    } yield (b, sig.slice(b * rpb, b * rpb + rpb), id, tsMs, sig)
    bandRows.groupBy { case (b, chunk, _, _, _) => (b, chunk) }.foreach {
      case (_, members) =>
        val sorted = members.sortBy { case (_, _, id, tsMs, _) => (tsMs, id) }
        val stored = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
        for ((_, _, id, _, sig) <- sorted) {
          stored.iterator.map { case (mid, s) =>
            (mid, s.zip(sig).count(p => p._1 == p._2).toDouble / h)
          }.find(_._2 >= threshold)
            .foreach { case (mid, est) => out += ((id, mid, est)) }
          if (stored.length < maxBucket) stored += (id -> sig)
        }
    }
    out.toSet
  }

  test("fuzz: batch StreamDedup == independent fold in BOTH hash modes " +
      "across seeds x thresholds x caps (ties, cap truncation, boundary)") {
    var totalHits = 0
    for (seed <- 1 to 6) {
      val rnd = new Random(seed * 7919L)
      val n = 40 + rnd.nextInt(80)
      val corpus = randomCorpus(rnd, n)
      val maxBucket = Seq(2, 4, 64)(rnd.nextInt(3))
      val threshold = Seq(0.25, 0.5, 0.75)(rnd.nextInt(3))
      val df = corpus.toDF("doc_id", "ts_ms", "text")
        .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"),
          col("text"))
      for (md5Mode <- Seq(false, true)) {
        val got = StreamDedup.nearDupHits(df, "doc_id", "ts", "text",
            threshold = threshold, maxBucket = maxBucket, md5Mode = md5Mode)
          .select("doc_id", "dup_of", "est").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        val sigFrame =
          if (md5Mode) graft.operators.Dedup.minhashSigMd5Frame(
            df, "text", Seq("doc_id", "ts"), 32, 3)
          else df.select(col("doc_id"), col("ts"),
            graft.operators.Dedup.minhashSignature(col("text"), 32, 3)
              .as("sig"))
        val sigs = sigFrame.select("doc_id", "ts", "sig").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
            r.getSeq[Long](2).toVector))
          .toSeq
        val want = dedupReference(sigs, 8, 4, threshold, maxBucket)
        assert(got == want,
          s"seed=$seed mode=${if (md5Mode) "md5" else "xx"} cap=$maxBucket " +
            s"t=$threshold: extra=${got -- want}, missing=${want -- got}")
        totalHits += got.size
      }
    }
    assert(totalHits >= 100, s"fuzz vacuous: only $totalHits hits total")
  }

  /** Textbook Misra-Gries, written from the decrement rule directly. */
  private def mgNaive(terms: Seq[String], k: Int): Map[String, Long] = {
    val c = scala.collection.mutable.Map.empty[String, Long]
    for (t <- terms) {
      if (c.contains(t)) c(t) += 1
      else if (c.size < k) c(t) = 1
      else c.keys.toVector.foreach { w =>
        c(w) -= 1; if (c(w) == 0) c.remove(w)
      }
    }
    c.toMap
  }

  test("fuzz: batch StreamTopK == textbook Misra-Gries across seeds x k, " +
      "with the n/(k+1) guarantee at every run") {
    var nonTrivial = 0
    for (seed <- 1 to 8) {
      val rnd = new Random(seed * 104729L)
      val n = 100 + rnd.nextInt(300)
      val k = Seq(1, 2, 4, 8)(rnd.nextInt(4))
      val keys = Vector("a", "b", "c")
      // zipf-ish terms so some exceed n/(k+1); colliding timestamps
      val rows = (0 until n).map { i =>
        val key = keys(rnd.nextInt(keys.size))
        val term = s"u${(math.pow(rnd.nextDouble(), 2.5) * 20).toInt}"
        val tsSec = 10000L + rnd.nextInt(math.max(2, n / 4))
        (key, tsSec * 1000L, term)
      }
      val df = rows.toDF("k", "ts_ms", "term")
        .select(col("k"), timestamp_millis(col("ts_ms")).as("ts"),
          col("term"))
      val got = StreamTopK.topTerms(df, "k", "ts", "term", k = k)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (key, rs) =>
        val ordered = rs.sortBy(r => (r._2, r._3)).map(_._3)
        mgNaive(ordered, k).map { case (w, c) =>
          (key, w, c, rs.length.toLong)
        }
      }.toSet
      assert(got == want,
        s"seed=$seed k=$k: extra=${got -- want}, missing=${want -- got}")
      // the guarantee, independent of the fold: no overcount, undercount
      // <= n/(k+1), and every term with true count > n/(k+1) survives
      val trueCounts = rows.groupBy(r => (r._1, r._3))
        .view.mapValues(_.size.toLong).toMap
      val perKeyN = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      got.foreach { case (key, w, est, nk) =>
        val tc = trueCounts((key, w))
        assert(est <= tc && tc - est <= nk / (k + 1),
          s"seed=$seed guarantee violated for ($key,$w): est=$est true=$tc")
      }
      perKeyN.foreach { case (key, nk) =>
        trueCounts.collect {
          case ((kk, w), tc) if kk == key && tc > nk / (k + 1) => w
        }.foreach { w =>
          assert(got.exists(g => g._1 == key && g._2 == w),
            s"seed=$seed heavy term $w (key $key) missing from summary")
        }
      }
      if (got.size >= k) nonTrivial += 1
    }
    assert(nonTrivial >= 4, s"fuzz vacuous: only $nonTrivial non-trivial runs")
  }
}
