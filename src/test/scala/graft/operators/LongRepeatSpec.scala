package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Long-repeat detection at arbitrary alignment: alignment-freedom,
  * maximality, the minLen cut, bucket boundedness — and the
  * LOAD-BEARING contrast the operator exists for: planted 48-char
  * repeats that [[Corpus.cdcChunks]]'s census provably MISSES (no full
  * chunk inside) are caught by [[Corpus.longRepeats]].
  */
class LongRepeatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def filler(seed: String, n: Int): String = {
    // deterministic letter filler with NO internal repeats across seeds
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new StringBuilder
    var blk = 0
    while (sb.length < n) {
      md.reset()
      md.digest(s"$seed:$blk".getBytes("UTF-8")).foreach { b =>
        if (sb.length < n) sb.append(('a' + ((b & 0xff) % 26)).toChar)
      }
      blk += 1
    }
    sb.toString
  }

  private def repeats(docs: Seq[(Long, String)]) =
    Corpus.longRepeats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("a 60-char repeat is caught at ARBITRARY alignment with exact maximal extent") {
    // completeness is probabilistic in the anchor draw (~1/16 per
    // position): pick the first deterministic filler whose segment
    // carries an interior anchor — the pick itself is deterministic,
    // and anchors are content-defined, so it holds at EVERY embedding
    val g = Corpus.cdcWeights(8).toArray
    val seg = (0 until 20).iterator
      .map(i => filler(s"shared$i", 60))
      .find(t => Corpus.anchorWalk(t, 8, 16, g, 16).nonEmpty)
      .get
    for (offB <- Seq(0, 1, 7, 33, 100)) {
      val a = filler("docA", 50) + seg + filler("docA2", 80)
      val b = filler("docB", offB) + seg + filler("docB2", 40)
      val got = repeats(Seq((1L, a), (2L, b)))
      val hit = got.filter(r => r._1 == 1L && r._2 == 2L)
      assert(hit.length === 1, s"offB=$offB: $got")
      // maximal extent = exactly the planted segment (surroundings differ)
      assert(hit.head === ((1L, 2L, 51L, (offB + 1).toLong, 60L)),
        s"offB=$offB")
    }
  }

  test("exactRepeats: exhaustive ground truth — every repeat >= minLen, exact spans, nothing else") {
    import org.apache.spark.sql.DataFrame
    def exact(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)],
        minLen: Int = 40): Set[(Long, Long, Long, Long, Long)] =
      Corpus.exactRepeats(docs.toDF("doc_id", "text"), "doc_id", "text",
          pairs.toDF("id_a", "id_b"), minLen)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet

    // two repeats between one pair at different alignments + one
    // sub-minLen repeat (must NOT be reported), sentinel-separated
    val r1 = filler("r1", 44)
    val r2 = filler("r2", 71)
    val r3 = filler("r3", 39) // below minLen
    val a = filler("a0", 10) + r1 + "<" + filler("a1", 25) + r2 + "<" +
      r3 + "<" + filler("a2", 12)
    val b = filler("b0", 31) + r2 + ">" + filler("b1", 7) + r1 + ">" +
      r3 + ">" + filler("b2", 18)
    // a: a0[1..10] r1[11..54] < a1[56..80] r2[81..151] < r3[153..191] < a2
    // b: b0[1..31] r2[32..102] > b1[104..110] r1[111..154] > r3[156..194] >
    val got = exact(Seq((1L, a), (2L, b)), Seq((1L, 2L)))
    assert(got === Set(
      (1L, 2L, 11L, 111L, 44L), // r1 — exact span, both alignments
      (1L, 2L, 81L, 32L, 71L))) // r2 — r3 (39 < minLen) correctly absent

    // pairs are censused independently; an unlisted pair contributes
    // nothing even when it shares content
    val c = filler("c0", 5) + r2 + filler("c1", 9)
    val got3 = exact(Seq((1L, a), (2L, b), (3L, c)),
      Seq((1L, 2L), (1L, 3L)))
    assert(got3 === Set(
      (1L, 2L, 11L, 111L, 44L), (1L, 2L, 81L, 32L, 71L),
      (1L, 3L, 81L, 6L, 71L)))

    // repeats touching text edges round-trip exactly
    val e1 = r1 + filler("e1", 12)
    val e2 = filler("e2", 9) + r1
    assert(exact(Seq((7L, e1), (8L, e2)), Seq((7L, 8L))) ===
      Set((7L, 8L, 1L, 10L, 44L)))
  }

  test("repeats shorter than minLen are not reported; self-pairs never appear") {
    val seg = filler("short", 30) // < minLen 40
    val a = filler("dA", 60) + seg + filler("dA2", 60)
    val b = filler("dB", 45) + seg + filler("dB2", 60)
    assert(repeats(Seq((1L, a), (2L, b))).isEmpty)
    // a doc repeated with ITSELF under one id yields nothing
    val self = filler("sf", 40) + seg + filler("sf2", 30) + seg
    assert(repeats(Seq((9L, self))).forall(r => r._1 != r._2))
  }

  test("hot seeds are bucket-capped: n docs sharing one segment yield <= maxBucket star pairs") {
    val seg = filler("boiler", 80)
    val docs = (0 until 30).map(i =>
      (i.toLong, filler(s"pre$i", 20 + i) + seg + filler(s"post$i", 25)))
    val got = repeats(docs)
    // star pairs: every reported pair anchors on the first arrival,
    // and per seed bucket at most maxBucket (8) partners
    assert(got.nonEmpty && got.forall(_._1 == 0L))
    assert(got.length <= 8 * 4, s"unbounded pair growth: ${got.length}")
  }

  test("scrubLongRepeats: the later copy loses exactly the maximal repeat; first arrival and untouched docs pass through") {
    val g = Corpus.cdcWeights(8).toArray
    val seg = (0 until 20).iterator.map(i => filler(s"scr$i", 60))
      .find(t => Corpus.anchorWalk(t, 8, 16, g, 16).nonEmpty).get
    val a = filler("sA", 50) + seg + filler("sA2", 50)
    val b = filler("sB", 30) + seg + filler("sB2", 70)
    val c = filler("sC", 90) // untouched
    val out = Corpus.scrubLongRepeats(
      Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((a, 0L, 0L))) // first arrival keeps its text
    assert(out(3L) === ((c, 0L, 0L))) // untouched passes through
    val (ct, spans, removed) = out(2L)
    assert(spans === 1L && removed === 60L)
    assert(ct === filler("sB", 30) + filler("sB2", 70)) // exact cut
    assert(!ct.contains(seg.substring(0, 20)))
  }

  test("scrubLongRepeats: overlapping spans in one doc merge into one island") {
    val g = Corpus.cdcWeights(8).toArray
    // two 50-char segments that OVERLAP in the dup doc by sharing 20
    // chars: plant seg1+tail20 where tail20 = seg2's head
    val seg1 = (0 until 20).iterator.map(i => filler(s"ov1$i", 50))
      .find(t => Corpus.anchorWalk(t, 8, 16, g, 16).nonEmpty).get
    val seg2 = (0 until 20).iterator.map(i => filler(s"ov2$i", 50))
      .find(t => Corpus.anchorWalk(t, 8, 16, g, 16).nonEmpty).get
    // doc D contains seg1 immediately followed by seg2 (100 chars);
    // first arrivals A1 carries seg1+seg2's first 10 (59 matchable),
    // A2 carries seg2 — D's two reported spans overlap/adjoin
    val a1 = filler("o1", 40) + seg1 + seg2.substring(0, 10) + filler("o1b", 40)
    val a2 = filler("o2", 55) + seg2 + filler("o2b", 35)
    val dup = filler("od", 20) + seg1 + seg2 + filler("odb", 30)
    val out = Corpus.scrubLongRepeats(
      Seq((1L, a1), (2L, a2), (5L, dup)).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val (ct, spans, removed) = out(5L)
    assert(spans === 1L, s"overlapping spans did not merge: $out")
    assert(removed === 100L)
    assert(ct === filler("od", 20) + filler("odb", 30))
  }

  test("xxhash64 (production) and md5 (oracle twin) bucket modes agree on the planted corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    def run(md5: Boolean) =
      Corpus.longRepeats(docs, "doc_id", "text", md5Mode = md5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    // seed equality is verified in the join on BOTH modes, so the hash
    // family can only perturb a hot bucket's cap composition — absent a
    // cap-pressure bucket the two modes are identical
    assert(run(md5 = false) === run(md5 = true))
  }

  test("the planted-straddle contrast corpus: longRepeats catches pairs whose CDC census shares NOTHING") {
    // the q_long_repeats synthesis at sf0.001
    val dir = "/root/testdata/sf0.001"
    val planted = graft.queries.Tables.documents(spark, dir)
      .selectExpr("doc_id", "doc_id div 10 AS j",
        "CAST(LEAST(40 + doc_id % 13, length(text)) AS INT) AS off", "text")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 10 <= 1 THEN substring(text, 1, off) || " +
          "md5(CONCAT('rep:', CAST(j AS STRING))) || " +
          "substring(md5(CONCAT('repB:', CAST(j AS STRING))), 1, 16) " +
          "|| substring(text, off + 1) ELSE text END AS text")
    val reps = Corpus.longRepeats(planted, "doc_id", "text")
      .filter(col("id_a") % 10 <= 1 && col("id_b") % 10 <= 1 &&
        (col("id_a") / 10).cast("long") === (col("id_b") / 10).cast("long"))
      .select("id_a", "id_b", "rep_len").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)), r.getLong(2)))
    val caughtPairs = reps.map(r => (r._1, r._2)).toSet
    val nPairs = 5 // sf0.001: 50 docs -> j in 0..4
    assert(caughtPairs.size >= nPairs * 4 / 5,
      s"too few planted pairs caught: $caughtPairs")
    assert(reps.forall(_._3 >= 48L),
      "a planted repeat extended to less than its 48 chars")

    // the MISS: at least one caught pair shares ZERO full CDC chunks —
    // the exact-substring tail cdcChunks cannot see
    val chunks = Corpus.cdcChunks(planted, "doc_id", "text")
      .select(col("id"), col("chunk")).collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getString(1)).toSet
      }
    val missedByCdc = caughtPairs.filter { case (a, b) =>
      chunks.getOrElse(a, Set.empty)
        .intersect(chunks.getOrElse(b, Set.empty)).isEmpty
    }
    assert(missedByCdc.nonEmpty,
      "every planted pair also shared a full CDC chunk — the contrast " +
        "corpus no longer demonstrates the tail this operator closes")
  }
}
