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

  test("censusWalk == chunkWalk + anchorWalk on corpus text and hostile strings") {
    // the fused walk exists to hash each position ONCE for both
    // consumers; this pin is the one-definition discipline for it
    val g = Corpus.cdcWeights(8).toArray
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0)).take(200)
    val hostile = Seq(null, "", "x", "ab", "一二三四五六七八九十" * 5,
      "a" * 7, "a" * 8, "a" * 40, "😀" * 20, " \t\n" * 10)
    for (t <- real ++ hostile) {
      val fused = Corpus.censusWalk(t, 8, 32, 16, g, 16).toVector
      val chunks = fused.collect { case (0, a, b, p) => (a, p, b) }
      val anchors = fused.collect { case (1, a, _, p) => (a, p) }
      assert(chunks === Corpus.chunkWalk(t, 8, 32, g).toVector,
        s"chunk drift on ${String.valueOf(t).take(40)}")
      assert(anchors === Corpus.anchorWalk(t, 8, 16, g, 16).toVector,
        s"anchor drift on ${String.valueOf(t).take(40)}")
    }
  }

  test("scrubComposite: chunk census, arbitrary-alignment repeats and token spans cut with chained-serial semantics") {
    // planted: an exact-dup pair (chunk census — removed EVERYWHERE),
    // an arbitrary-alignment 60-char repeat (anchor path — LATER copy
    // loses), a LONG shared phrase (>= minLen: the repeat path cuts the
    // later copy FIRST, dropping the 8-gram below minDocs, so the first
    // arrival KEEPS it — exactly what the chained serial cdc -> repeat
    // -> span pipeline produces), and a SHORT 8-token boilerplate
    // (< minLen codepoints: only the token mask can cut it — from ALL
    // carriers)
    val g = Corpus.cdcWeights(8).toArray
    val seg = (0 until 20).iterator
      .map(i => filler(s"cshare$i", 60))
      .find(t => Corpus.anchorWalk(t, 8, 16, g, 16).nonEmpty).get
    val long = "all rights reserved license header boilerplate text line"
    val short = "a1 b2 c3 d4 e5 f6 g7 h8"
    val docs = Seq(
      (1L, filler("c1", 120) + " " + long + " " + filler("c1b", 80)),
      (2L, filler("c2", 50) + seg + filler("c2b", 90) + " " + long),
      (3L, filler("c3", 30) + seg + filler("c3b", 60) + " " + short +
        " " + filler("c3c", 40)),
      (4L, filler("c4", 200)),
      (5L, filler("c4", 200)), // exact dup of 4
      (6L, filler("c6", 70) + " " + short + " " + filler("c6b", 90)))
    val out = Corpus.scrubComposite(docs.toDF("doc_id", "text"),
      "doc_id", "text", md5Mode = true)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3), r.getLong(5))).toMap
    // the exact-dup pair loses its duplicated chunks (both copies —
    // the census removes cross-doc duplicated chunks everywhere)
    assert(out(4L)._2 > 0 && out(5L)._2 > 0, s"dup pair kept: $out")
    // later copies of >= minLen shared runs lose them (repeat path
    // and/or census — whichever boundaries fall inside, the span union
    // covers the run on the later copy)
    assert(!out(3L)._1.contains(seg), "repeat content survived in the later copy")
    assert(!out(2L)._1.contains("boilerplate"), "later copy kept the long phrase")
    // the short 8-gram is below minLen AND chunk-free: only the token
    // mask can fire — and it removes from EVERY carrier, with zero
    // codepoint-domain spans on the carrier that shares nothing else
    assert(out(6L)._2 === 0L, s"doc 6 should see no codepoint cut: $out")
    assert(!out(3L)._1.contains("a1") && !out(6L)._1.contains("a1"),
      "short boilerplate survived the token mask")
    assert(out(3L)._3 >= 8 && out(6L)._3 >= 8)
  }

  test("scrubComposite: the hot-cut shuffled fallback (hotBroadcastCap=0) == the broadcast path, row for row") {
    // the broadcast guard is a PHYSICAL choice only: above the cap the
    // anchor cut runs as a shuffled left_anti instead of collecting the
    // span set on the driver — the output must be byte-identical
    val g = Corpus.cdcWeights(8).toArray
    val seg = (0 until 20).iterator
      .map(i => filler(s"fshare$i", 60))
      .find(t => Corpus.anchorWalk(t, 8, 16, g, 16).nonEmpty).get
    val docs = Seq(
      (1L, filler("f1", 120) + seg + filler("f1b", 80)),
      (2L, filler("f2", 50) + seg + filler("f2b", 90)),
      (3L, filler("f3", 200)),
      (4L, filler("f3", 200)),
      (5L, filler("f5", 150))).toDF("doc_id", "text")
    def run(cap: Long) = Corpus.scrubComposite(docs, "doc_id", "text",
        md5Mode = true, hotBroadcastCap = cap)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(run(0L) === run(1L << 20), "fallback diverged from broadcast")
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

    // a DUPLICATED declared pair must not double the diagonal matches
    // (which would break the row_number island identity and fragment
    // one maximal repeat into several wrong-length rows)
    assert(exact(Seq((1L, a), (2L, b)), Seq((1L, 2L), (1L, 2L))) === got,
      "duplicate pairs fragmented the certificate ground truth")

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
    val planted = graft.queries.PipelineQueries
      .plantedRepeatDocs(graft.queries.Tables.documents(spark, dir))
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
