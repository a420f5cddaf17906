package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** Quantified agreement between the md5 oracle modes (what the declared
  * queries run and DuckDB replays) and the XXH64 production kernels (what
  * q_dedup_minhash_xx / q_dedup_simhash_xx / q_embed_neardup_xx bench).
  *
  * The clear-cut-duplicate specs in OperatorsSpec pin exact equality on
  * corpora whose dups sit far above the banding S-curve; these specs go
  * further on a RANDOMIZED corpus that deliberately plants borderline
  * pairs (where banding recall is probabilistic and hash families MAY
  * legitimately differ):
  *
  *  1. MinHash: the two modes' verified pair sets must agree to Jaccard
  *     >= 0.9, and every disagreement must be a borderline pair (exact
  *     shingle-Jaccard inside the banding S-curve's probabilistic band),
  *     never a clear-cut one.
  *  2. SimHash: the 4x16-chunk banding completeness law — every pair at
  *     signature hamming <= 3 IS a candidate (pigeonhole) — holds in
  *     BOTH hash modes on planted near-dups, checked against driver-side
  *     all-pairs hamming over the signatures.
  *
  * Everything is seeded and deterministic: same corpus, same signatures,
  * same sets on every run.
  */
class HashModeAgreementSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  /** Seeded synthetic corpus: base docs plus near-dup variants at
    * per-token mutation rates spanning clear-cut (j >= 0.8) through
    * borderline (j ~ 0.5) shingle-Jaccard, plus exact duplicates and
    * unrelated filler. Returns (docs, variantPairs).
    */
  private def plantedCorpus(seed: Long, nBase: Int, docLen: Int,
      mutationRates: Seq[Double]): (Seq[(Long, String)], Seq[(Long, Long)]) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.tabulate(400)(i => s"tok$i")
    def randTokens(n: Int): Vector[String] =
      Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val base = (0 until nBase).map(i => i.toLong -> randTokens(docLen))
    var nextId = nBase.toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    base.foreach { case (id, toks) => out += id -> toks.mkString(" ") }
    // one variant per (base doc, assigned rate), cycling the rates
    base.zipWithIndex.foreach { case ((id, toks), i) =>
      if (i < mutationRates.length) {
        val p = mutationRates(i)
        val mut = toks.map(t =>
          if (rnd.nextDouble() < p) vocab(rnd.nextInt(vocab.size)) else t)
        out += nextId -> mut.mkString(" ")
        pairs += ((id, nextId))
        nextId += 1
      }
    }
    (out.toSeq, pairs.toSeq)
  }

  test("minhash md5 vs xxhash on a randomized borderline corpus: pair-set " +
      "Jaccard >= 0.9 and every disagreement is inside the S-curve band") {
    // 20 clear-cut variants (p <= 0.05 -> shingle-j >= ~0.75), 6 at the
    // banding margin (p in [0.08, 0.12] -> j ~ 0.5-0.65, where candidate
    // probability at 8x4 banding is 0.4-0.8 and the hash families may
    // legitimately differ), plus 6 exact duplicates via p = 0.
    val rates = Seq.fill(6)(0.0) ++ Seq.fill(12)(0.02) ++ Seq.fill(8)(0.05) ++
      Seq.fill(4)(0.08) ++ Seq.fill(2)(0.12)
    val (corpus, _) = plantedCorpus(seed = 20260814L, nBase = 50,
      docLen = 50, mutationRates = rates)
    val df = corpus.toDF("doc_id", "text")
    def pairSet(d: DataFrame): Set[(Long, Long)] =
      d.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val xx = pairSet(Dedup.minhashNearDups(df, "doc_id", "text",
      threshold = 0.5))
    val md = pairSet(Dedup.minhashNearDupsMd5(df, "doc_id", "text",
      threshold = 0.5))
    val inter = (xx & md).size.toDouble
    val union = (xx | md).size.toDouble
    assert(union > 0, "test vacuous: neither mode found any pair")
    assert(xx.size >= 15 && md.size >= 15,
      s"test vacuous: too few pairs (xx=${xx.size}, md5=${md.size})")
    val agreement = inter / union
    assert(agreement >= 0.9,
      s"mode agreement ${agreement} < 0.9: xx-only ${xx -- md}, " +
        s"md5-only ${md -- xx}")
    // every disagreement must be a borderline pair: exact token-shingle
    // Jaccard in (0.45, 0.75) — the band where 8x4 banding recall is
    // genuinely probabilistic. A clear-cut pair (j >= 0.75, candidate
    // probability >= 0.95 per mode) appearing in only one mode would be
    // a kernel bug, not hash-family variance.
    val texts = corpus.toMap
    def shingleJ(a: Long, b: Long): Double = {
      def sh(t: String): Set[Seq[String]] =
        t.split("\\s+").toSeq.sliding(3).map(_.toSeq).toSet
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      (sa & sb).size.toDouble / (sa | sb).size.toDouble
    }
    val disputed = (xx | md) -- (xx & md)
    disputed.foreach { case (a, b) =>
      val j = shingleJ(a, b)
      assert(j > 0.45 && j < 0.75,
        s"pair ($a,$b) with clear-cut jaccard $j found by only one mode")
    }
  }

  test("stream near-dup md5 vs xxhash on the randomized borderline " +
      "corpus: hit-set Jaccard >= 0.9 and every disagreement is borderline") {
    // same rate mix as the minhash agreement test; hits here flag on
    // SIGNATURE positional agreement (no exact-jaccard verify pass), so
    // the per-pair estimate is a mean of h=32 Bernoulli(j) trials with
    // std ~0.08 — the legitimate-variance window is correspondingly wider
    // (j < 0.8) than the verified-pair test's 0.75
    val rates = Seq.fill(6)(0.0) ++ Seq.fill(12)(0.02) ++ Seq.fill(8)(0.05) ++
      Seq.fill(4)(0.08) ++ Seq.fill(2)(0.12)
    val (corpus, _) = plantedCorpus(seed = 20260814L, nBase = 50,
      docLen = 50, mutationRates = rates)
    val df = corpus.toDF("doc_id", "text")
      .withColumn("ts",
        timestamp_micros((col("doc_id") + 10000L) * 1000000L))
    def hitSet(md5Mode: Boolean): Set[(Long, Long)] =
      graft.streaming.StreamDedup
        .nearDupHits(df, "doc_id", "ts", "text", threshold = 0.5,
          md5Mode = md5Mode)
        .select("doc_id", "dup_of").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val xx = hitSet(md5Mode = false)
    val md = hitSet(md5Mode = true)
    assert(xx.size >= 15 && md.size >= 15,
      s"test vacuous: too few hits (xx=${xx.size}, md5=${md.size})")
    val agreement = (xx & md).size.toDouble / (xx | md).size.toDouble
    assert(agreement >= 0.9,
      s"mode agreement ${agreement} < 0.9: xx-only ${xx -- md}, " +
        s"md5-only ${md -- xx}")
    val texts = corpus.toMap
    def shingleJ(a: Long, b: Long): Double = {
      def sh(t: String): Set[Seq[String]] =
        t.split("\\s+").toSeq.sliding(3).map(_.toSeq).toSet
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      (sa & sb).size.toDouble / (sa | sb).size.toDouble
    }
    ((xx | md) -- (xx & md)).foreach { case (a, b) =>
      val j = shingleJ(a, b)
      assert(j > 0.45 && j < 0.8,
        s"hit ($a,$b) with clear-cut jaccard $j found by only one mode")
    }
  }

  /** Driver-side md5 simhash signature as 4 16-bit chunks — the same
    * independent replay OperatorsSpec pins the engine against. */
  private def md5Chunks(text: String): IndexedSeq[Long] = {
    val votes = new Array[Int](64)
    for (t <- text.trim.toLowerCase.split("\\s+")) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      def half(off: Int): Long =
        (0 until 4).foldLeft(0L)((a, i) => (a << 8) | (d(off + i) & 0xffL))
      val hi = half(0); val lo = half(4)
      for (i <- 0 until 64) {
        val h = if (i < 32) lo else hi
        votes(i) += (if (((h >> (i % 32)) & 1L) == 1L) 1 else -1)
      }
    }
    IndexedSeq.tabulate(4)(b =>
      (0 until 16).map(j => if (votes(b * 16 + j) > 0) 1L << j else 0L).sum)
  }

  test("simhash banding completeness law (hamming <= 3 pairs are ALWAYS " +
      "candidates) holds on planted near-dups in BOTH hash modes") {
    // 1-in-docLen mutation rates keep variants within a few signature
    // bits of their base (vote margins ~ sqrt(docLen)), planting genuine
    // hamming<=3 pairs; unrelated docs sit near hamming 32
    val rates = Seq.fill(24)(0.015)
    val (corpus, _) = plantedCorpus(seed = 777L, nBase = 30,
      docLen = 80, mutationRates = rates)
    val df = corpus.toDF("doc_id", "text")
    val bigBucket = 1 << 20 // no cap: the law is about banding, not skew

    def checkLaw(mode: String, sigChunks: Map[Long, IndexedSeq[Long]],
        cands: DataFrame): Unit = {
      val ids = sigChunks.keys.toSeq.sorted
      def ham(a: Long, b: Long): Int =
        (0 until 4).map(k =>
          java.lang.Long.bitCount(sigChunks(a)(k) ^ sigChunks(b)(k))).sum
      val expected = (for {
        a <- ids; b <- ids if a < b && ham(a, b) <= 3
      } yield (a, b)).toSet
      val got = cands.filter(col("hamming") <= 3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.size >= 5,
        s"$mode: test vacuous — only ${expected.size} planted pairs at " +
          "hamming <= 3")
      assert(got == expected,
        s"$mode banding law violated: missed ${expected -- got}, " +
          s"phantom ${got -- expected}")
    }

    // xxhash mode: signatures from the production SimHash64 kernel itself
    // (the law then checks banding/bounding/hamming around it)
    val xxSigs = df.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .collect().map { r =>
        val s = r.getLong(1)
        r.getLong(0) -> IndexedSeq.tabulate(4)(b => (s >>> (b * 16)) & 0xFFFFL)
      }.toMap
    checkLaw("xxhash", xxSigs,
      Dedup.simhashCandidates(df, "doc_id", "text", maxBucket = bigBucket))

    // md5 mode: signatures from the independent driver replay (the law
    // then also cross-checks the engine's relational vote pipeline)
    val mdSigs = corpus.map { case (id, t) => id -> md5Chunks(t) }.toMap
    checkLaw("md5", mdSigs,
      Dedup.simhashCandidatesMd5(df, "doc_id", "text", maxBucket = bigBucket))
  }

  test("content-hash sample posture (trainCentroids default / classifier " +
      "content-order): layout- and id-assignment-INDEPENDENT — the law " +
      "that justifies its spec-level home (SURVEY 5.3)") {
    import spark.implicits._
    // 3000 synthetic vectors in 3 clusters, MORE than maxSample so the
    // content-hash order genuinely SELECTS a subset (at the verify SFs
    // the sample is the full table and selection is vacuous — this spec
    // exercises the regime the certificate row cannot)
    def vecs(idOf: Int => Long): org.apache.spark.sql.DataFrame =
      (0 until 3000).map { i =>
        val c = i % 3
        val base = Array.fill(8)(0.01 * ((i * 7) % 11))
        base(c) = 1.0 + 0.001 * (i % 97)
        (idOf(i), base.toSeq)
      }.toDF("vec_id", "embedding")
    val a = vecs(i => i.toLong)
    val maxSample = 500
    val trained = Similarity.trainCentroids(a, "embedding", k = 3,
      maxSample = maxSample)
    // 1) layout independence: any repartition/shuffle of the same rows
    //    trains the IDENTICAL model (xxhash64(vec) is a pure function of
    //    content; TakeOrdered is layout-free)
    val relayout = Similarity.trainCentroids(a.repartition(13), "embedding",
      k = 3, maxSample = maxSample)
    assert(trained == relayout,
      "content-hash sample mode must be layout-independent")
    // 2) re-ingestion stability: a different ID ASSIGNMENT of the same
    //    vectors trains the identical model (ids never enter the order)
    val reingested = Similarity.trainCentroids(
      vecs(i => 1000000L + ((i * 2654435761L) % 3000)), "embedding",
      k = 3, maxSample = maxSample)
    assert(trained == reingested,
      "content-hash sample mode must be id-assignment-independent")
    // 3) duplicate-content ties are harmless: tied order keys are
    //    IDENTICAL vectors, so whichever copy the cut takes, the sampled
    //    vector sequence — and the model — is unchanged
    val withDups = a.union(a.limit(200)).repartition(7)
    val dupTrained = Similarity.trainCentroids(withDups, "embedding",
      k = 3, maxSample = maxSample)
    val dupRelayout = Similarity.trainCentroids(withDups.repartition(17),
      "embedding", k = 3, maxSample = maxSample)
    assert(dupTrained == dupRelayout,
      "duplicate-content ties must not make the sample layout-dependent")
    // 4) the premise that rules OUT an equality certificate: the
    //    id-ordered twin legitimately trains a DIFFERENT model on the
    //    same data (different sample subset + different init seed), so a
    //    cross-mode certificate would need a model-quality contract --
    //    and at the verify SFs both modes see the full table anyway,
    //    making such a contract vacuous there (ratio 1 by construction)
    val idOrdered = Similarity.trainCentroids(a, "embedding", k = 3,
      maxSample = maxSample, sampleOrderCol = Some("vec_id"))
    assert(trained != idOrdered,
      "premise check: the two sample modes train different models (if " +
        "this ever fails, an equality certificate became possible)")
    // the same laws for the classifier's content-order posture
    val labeled = a.withColumn("label",
      (col("vec_id") % 3 === 0).cast("double"))
      .withColumn("__content", xxhash64(col("embedding")))
      .withColumn("embedding",
        col("embedding").cast("array<float>"))
    val m1 = QualityClassifier.train(labeled, "vec_id", "embedding",
      "label", maxSample = maxSample, sampleOrderCol = Some("__content"))
    val m2 = QualityClassifier.train(labeled.repartition(13), "vec_id",
      "embedding", "label", maxSample = maxSample,
      sampleOrderCol = Some("__content"))
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.bias == m2.bias,
      "classifier content-order training must be layout-independent")
  }
}
