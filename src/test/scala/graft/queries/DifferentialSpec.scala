package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** The q_*_xx differential certificates must DISCRIMINATE: agreement in
  * bounds → all-true row; a broken production pipeline (hash corruption,
  * dropped pairs, missed duplicates) flips the contract booleans so the
  * driver's hash-compare goes red. Ground-truth counts follow the
  * pipelines' NULL-as-'' content rule.
  */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def docs: DataFrame = Seq(
    (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), // exact dups
    (3L, "delta epsilon"), (4L, "zeta eta theta"),
    (5L, null.asInstanceOf[String]), (6L, "")            // null == '' content
  ).toDF("doc_id", "text")

  private def pairs(p: (Long, Long)*): DataFrame =
    p.toSeq.toDF("id_a", "id_b")

  private def hits(p: (Long, Long)*): DataFrame =
    p.toSeq.toDF("doc_id", "dup_of")

  test("pairCertificate: full agreement and caught dups → all contracts true") {
    val out = pairs(1L -> 2L, 5L -> 6L, 3L -> 4L)
    val row = Differential.pairCertificate(docs, "doc_id", "text",
      out, out, jaccardBound = 0.9, recallBound = 0.9).collect().head
    // ground truth: (1,2) identical text, (5,6) null-vs-empty identical
    assert(row.getAs[Long]("n_twin") == 3)
    assert(row.getAs[Long]("n_exact_dup_pairs") == 2)
    assert(row.getAs[Boolean]("exact_dup_recall_ok"))
    assert(row.getAs[Boolean]("pair_jaccard_ok"))
  }

  test("pairCertificate: disagreeing pair sets flip pair_jaccard_ok") {
    val row = Differential.pairCertificate(docs, "doc_id", "text",
      pairs(1L -> 2L, 5L -> 6L, 1L -> 3L, 2L -> 4L),
      pairs(1L -> 2L, 5L -> 6L),
      jaccardBound = 0.9, recallBound = 0.9).collect().head
    // jaccard = 2/4 = 0.5 < 0.9; recall still fine (both dups caught by xx)
    assert(!row.getAs[Boolean]("pair_jaccard_ok"))
    assert(row.getAs[Boolean]("exact_dup_recall_ok"))
  }

  test("pairCertificate: a missed exact duplicate flips exact_dup_recall_ok") {
    val out = pairs(5L -> 6L, 3L -> 4L) // (1,2) missing from xx
    val row = Differential.pairCertificate(docs, "doc_id", "text",
      out, out, jaccardBound = 0.9, recallBound = 0.9).collect().head
    assert(!row.getAs[Boolean]("exact_dup_recall_ok"))
    assert(row.getAs[Boolean]("pair_jaccard_ok"))
  }

  test("pairCertificate: a degenerate duplicate below the token floor is " +
      "not ground truth — a planted 2-token twin cannot flip a k=3 " +
      "certificate red") {
    val degen = Seq(
      (1L, "tiny text"), (2L, "tiny text"),          // 2 tokens: k=3 CANNOT catch
      (3L, "alpha beta gamma"), (4L, "alpha beta gamma") // 3 tokens: catchable
    ).toDF("doc_id", "text")
    // the pipeline structurally catches only (3,4); with minTokens = 3
    // the ground truth agrees and the contract stays green
    val out = pairs(3L -> 4L)
    val row = Differential.pairCertificate(degen, "doc_id", "text",
      out, out, jaccardBound = 0.9, recallBound = 0.9,
      minTokens = 3).collect().head
    assert(row.getAs[Long]("n_exact_dup_pairs") == 1)
    assert(row.getAs[Boolean]("exact_dup_recall_ok"))
    // without the floor the same healthy output would read as a miss —
    // the false-red the floor exists to prevent
    val naive = Differential.pairCertificate(degen, "doc_id", "text",
      out, out, jaccardBound = 0.9, recallBound = 0.9,
      minTokens = 1).collect().head
    assert(naive.getAs[Long]("n_exact_dup_pairs") == 2)
    assert(!naive.getAs[Boolean]("exact_dup_recall_ok"))
  }

  test("pairCertificate: empty outputs on a dup-free corpus are vacuously ok") {
    val free = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val row = Differential.pairCertificate(free, "doc_id", "text",
      pairs(), pairs(), jaccardBound = 0.9, recallBound = 0.9).collect().head
    assert(row.getAs[Long]("n_twin") == 0 &&
      row.getAs[Long]("n_exact_dup_pairs") == 0)
    assert(row.getAs[Boolean]("exact_dup_recall_ok") &&
      row.getAs[Boolean]("pair_jaccard_ok"))
  }

  test("pinned bounds hold with margin on real data (sf0.001): the " +
      "verify-gate certificates cannot be one noise step from red") {
    // the certificate rows assert jaccard >= 0.9 (minhash family) and
    // >= 0.25 (simhash); this spec re-measures the underlying agreement
    // on the smallest real corpus and demands MARGIN above the pinned
    // bounds, so data or kernel drift surfaces here before it can park
    // the verify gate on a knife edge
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mh = Differential.pairStats(docs, "doc_id", "text",
      graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5),
      graft.operators.Dedup.minhashNearDupsMd5(docs, "doc_id", "text",
        threshold = 0.5)).collect().head
    val mhJ = mh.getAs[Double]("jaccard")
    assert(mh.getAs[Long]("n_twin") > 0, "vacuous: twin found no pairs")
    assert(mhJ >= 0.95, s"minhash xx-vs-md5 agreement eroded: $mhJ")
    val sh = Differential.pairStats(docs, "doc_id", "text",
      graft.operators.Dedup.simhashCandidates(docs, "doc_id", "text")
        .filter(org.apache.spark.sql.functions.col("hamming") <= 3),
      graft.operators.Dedup.simhashCandidatesMd5(docs, "doc_id", "text")
        .filter(org.apache.spark.sql.functions.col("hamming") <= 3))
      .collect().head
    val shJ = sh.getAs[Double]("jaccard")
    assert(sh.getAs[Long]("n_twin") > 0, "vacuous: twin found no pairs")
    assert(shJ >= 0.4, s"simhash xx-vs-md5 agreement eroded: $shJ " +
      "(tripwire bound 0.15 pinned against the r14 sweep's worst healthy " +
      "0.1892 at sf0.1; sf0.001 measured 0.67)")
    // the sensitive kernel law: twin pairs at production-signature
    // hamming p50 <= 4 measured (bench/diffprobe_simhash_r14.txt) —
    // the bound-10 median contract must hold with margin here
    val twin = graft.operators.Dedup.simhashCandidatesMd5(docs, "doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("hamming") <= 3)
    val sigsXx = docs.select(
      org.apache.spark.sql.functions.col("doc_id").as("id"),
      graft.operators.Dedup.simhash(
        org.apache.spark.sql.functions.col("text")).as("sig"))
    val agree = Differential.sigMedianAgreement(twin, sigsXx, maxHamming = 4)
      .collect().head
    assert(agree.getBoolean(0),
      "twin pairs no longer sit at small production-signature hamming " +
        "even at HALF the pinned bound (10) — kernel drift")
  }

  test("sigMedianAgreement discriminates: healthy sigs pass, corrupted " +
      "sigs flip, empty twin is vacuous") {
    import org.apache.spark.sql.functions._
    val twin = pairs((1L, 2L), (3L, 4L))
    // healthy: identical signatures per pair -> hamming 0 -> true
    val good = Seq((1L, 5L), (2L, 5L), (3L, 9L), (4L, 9L)).toDF("id", "sig")
    assert(Differential.sigMedianAgreement(twin, good, maxHamming = 10)
      .collect().head.getBoolean(0))
    // corrupted kernel: per-doc pseudo-random signatures -> hamming ~32
    val bad = Seq((1L, 5L), (2L, -6148914691236517206L), // 0x5555.. vs ~0xAAAA..
      (3L, 0L), (4L, -1L)).toDF("id", "sig")
    assert(!Differential.sigMedianAgreement(twin, bad, maxHamming = 10)
      .collect().head.getBoolean(0),
      "randomized signatures must flip twin_sig_agreement_ok")
    // exactly half within bound satisfies the median law (>= half rule)
    val half = Seq((1L, 5L), (2L, 5L), (3L, 0L), (4L, -1L)).toDF("id", "sig")
    assert(Differential.sigMedianAgreement(twin, half, maxHamming = 10)
      .collect().head.getBoolean(0))
    // vacuous on an empty twin
    assert(Differential.sigMedianAgreement(pairs(), good, maxHamming = 10)
      .collect().head.getBoolean(0))
  }

  test("certificate-scale guard: an over-cap corpus fails at execution " +
      "with a route to the content-hash-keyed operators") {
    import org.apache.spark.sql.functions._
    val out = pairs((1L, 2L))
    // within cap: runs
    assert(Differential.pairCertificate(docs, "doc_id", "text",
      out, out, jaccardBound = 0.9, recallBound = 0.9,
      maxRows = 100L).collect().length == 1)
    // over cap (docs has 6 rows): construction is job-free, execution
    // raises before shipping a corpus-sized content self-join
    val over = Differential.pairCertificate(docs, "doc_id", "text",
      out, out, jaccardBound = 0.9, recallBound = 0.9, maxRows = 3L)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] { over.collect() }
    assert(msgs(e1).mkString.contains("certificate-scale") &&
      msgs(e1).mkString.contains("content hash"),
      s"guard missing/unrouted: ${msgs(e1).mkString}")
    // same guard on the doc-level certificate
    val overDoc = Differential.docCertificate(docs, "doc_id", "text",
      hits((2L, 1L)), hits((2L, 1L)),
      jaccardBound = 0.9, recallBound = 0.9, maxRows = 3L)
    val e2 = intercept[Exception] { overDoc.collect() }
    assert(msgs(e2).mkString.contains("certificate-scale"))
    // and on the O(n^2) banding-completeness scan. Sig values: 5 vs -1
    // differ in 62 bits (far); equal sigs are the two close pairs.
    val sigs = Seq((1L, 5L), (2L, 5L), (3L, -1L), (4L, -1L)).toDF("id", "sig")
    val overBand = Differential.bandingCompletenessCertificate(
      sigs, pairs((1L, 2L)), maxHamming = 3, maxRows = 2L)
    val e3 = intercept[Exception] { overBand.collect() }
    assert(msgs(e3).mkString.contains("certificate-scale"))
    // within cap the completeness certificate computes: (1,2) and (3,4)
    // are the only hamming<=3 pairs; handing only (1,2) flips the law
    val ok = Differential.bandingCompletenessCertificate(
      sigs, pairs((1L, 2L), (3L, 4L)), maxHamming = 3).collect().head
    assert(ok.getLong(0) == 2L && ok.getBoolean(1))
    val incomplete = Differential.bandingCompletenessCertificate(
      sigs, pairs((1L, 2L)), maxHamming = 3).collect().head
    assert(!incomplete.getBoolean(1),
      "a dropped close pair must flip banding_complete_ok")
  }

  test("dsirCertificate discriminates: agreeing selections pass; disjoint " +
      "sets, scattered ranks and shifted weights flip their own contracts") {
    def w(rows: (Long, Double)*): DataFrame =
      rows.toSeq.toDF("id", "dsir_weight")
    // pool of 100 docs, weight descending in id; twin picks the top 2
    val weights = w((1L to 100L).map(i => i -> (101 - i).toDouble): _*)
    def sel(ids: Long*): DataFrame =
      w(ids.map(i => i -> (101 - i).toDouble): _*)
    val good = Differential.dsirCertificate(sel(1L, 2L), sel(1L, 2L),
      weights, k = 2, jaccardBound = 0.5, rankFactor = 2,
      weightDeltaBound = 0.5).collect().head
    assert(good.getAs[Long]("n_twin") == 2)
    assert(good.getAs[Boolean]("sel_jaccard_ok") &&
      good.getAs[Boolean]("twin_rank_ok") &&
      good.getAs[Boolean]("twin_weight_ok"))
    // xx picked a disjoint set but the twin's docs still rank high in xx
    // weights -> jaccard flips; rank/weight laws (which read the WEIGHTS,
    // not the xx set) hold: the contracts are independent signals
    val disjoint = Differential.dsirCertificate(sel(1L, 2L), sel(3L, 4L),
      weights, k = 2, jaccardBound = 0.5, rankFactor = 2,
      weightDeltaBound = 0.5).collect().head
    assert(!disjoint.getAs[Boolean]("sel_jaccard_ok"))
    assert(disjoint.getAs[Boolean]("twin_rank_ok") &&
      disjoint.getAs[Boolean]("twin_weight_ok"))
    // degraded cut: the twin's picks sit at ranks 99/100 of the xx
    // weight order -> median rank far past rankFactor*k -> rank law flips
    // (weights themselves agree, so the weight law holds)
    val scattered = Differential.dsirCertificate(sel(99L, 100L),
      sel(99L, 100L), weights, k = 2, jaccardBound = 0.5,
      rankFactor = 2, weightDeltaBound = 0.5).collect().head
    assert(scattered.getAs[Boolean]("sel_jaccard_ok"))
    assert(!scattered.getAs[Boolean]("twin_rank_ok"))
    assert(scattered.getAs[Boolean]("twin_weight_ok"))
    // degraded kernel: xx weights systematically shifted — the same
    // top-2 set and ranks, but the weight law flips
    val shifted = w((1L to 100L).map(i => i -> (201 - i).toDouble): _*)
    val badW = Differential.dsirCertificate(sel(1L, 2L), sel(1L, 2L),
      shifted, k = 2, jaccardBound = 0.5, rankFactor = 2,
      weightDeltaBound = 0.5).collect().head
    assert(badW.getAs[Boolean]("sel_jaccard_ok") &&
      badW.getAs[Boolean]("twin_rank_ok"))
    assert(!badW.getAs[Boolean]("twin_weight_ok"),
      "a systematic weight shift must flip twin_weight_ok")
    // a twin pick ABSENT from the xx weights frame is an infinite delta
    val dropped = Differential.dsirCertificate(sel(1L, 2L), sel(1L, 2L),
      weights.filter(org.apache.spark.sql.functions.col("id") =!= 1L),
      k = 2, jaccardBound = 0.5, rankFactor = 2,
      weightDeltaBound = 0.5).collect().head
    assert(!dropped.getAs[Boolean]("twin_weight_ok"),
      "a dropped twin pick must flip twin_weight_ok")
    // ties broken by id: rank of id=2 among equal weights counts only
    // smaller ids ahead; top-2 equal-weight picks stay rank 1..2
    val flat = w((1L to 10L).map(i => i -> 1.0): _*)
    val tied = Differential.dsirCertificate(
      w(1L -> 1.0, 2L -> 1.0), w(1L -> 1.0, 2L -> 1.0),
      flat, k = 2, jaccardBound = 0.5, rankFactor = 1,
      weightDeltaBound = 0.5).collect().head
    assert(tied.getAs[Boolean]("twin_rank_ok"))
    // vacuous on an empty twin
    val empty = Differential.dsirCertificate(sel(), sel(), weights,
      k = 2, jaccardBound = 0.5, rankFactor = 2,
      weightDeltaBound = 0.5).collect().head
    assert(empty.getAs[Long]("n_twin") == 0)
    assert(empty.getAs[Boolean]("sel_jaccard_ok") &&
      empty.getAs[Boolean]("twin_rank_ok") &&
      empty.getAs[Boolean]("twin_weight_ok"))
  }

  test("dsirCertificate flips on a BROKEN xx bucket hash (sf0.001): the " +
      "q_dsir_select_xx pinned bounds discriminate on real data") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dsir
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tgt = col("source") === "src0"
    val k = 50
    val md5Sel = Dsir.select(docs, "doc_id", "text", tgt, k = k)
    // healthy production mode passes the pinned bounds (0.10 / 8) with
    // margin: the r15 sweep measured jaccard 0.6393 / rank_p50 30 here
    val xxW = Dsir.weights(docs, "doc_id", "text", tgt, xx = true)
    val healthy = Differential.dsirCertificate(md5Sel, Dsir.cut(xxW, k),
      xxW, k = k, jaccardBound = 0.10, rankFactor = 8,
      weightDeltaBound = 2.8).collect().head
    assert(healthy.getAs[Long]("n_twin") == k)
    assert(healthy.getAs[Boolean]("sel_jaccard_ok") &&
      healthy.getAs[Boolean]("twin_rank_ok") &&
      healthy.getAs[Boolean]("twin_weight_ok"),
      "healthy xx mode must pass the pinned q_dsir_select_xx bounds")
    // and with MARGIN above the pinned jaccard tripwire (sweep floor
    // discipline: a bound one noise step from red is no gate)
    val mIds = md5Sel.select("id").collect().map(_.getLong(0)).toSet
    val xIds = Dsir.cut(xxW, k).select("id").collect()
      .map(_.getLong(0)).toSet
    val jac = (mIds & xIds).size.toDouble / (mIds | xIds).size.toDouble
    assert(jac >= 0.3, s"xx-vs-md5 selection agreement eroded: $jac " +
      "(tripwire 0.10 pinned against the r15 sweep's worst healthy " +
      "0.1628 at sf0.1; sf0.001 measured 0.6393)")
    // broken bucket kernel: every feature lands in bucket 0, weights
    // degenerate to ~n_feats x const — the certificate must go red
    val brokenW = Dsir.weightsFromCounts(
      Dsir.featureCountsWith(docs, "doc_id", "text", tgt, _ => lit(0L)),
      buckets = 1024, alpha = 1.0)
    val broken = Differential.dsirCertificate(md5Sel, Dsir.cut(brokenW, k),
      brokenW, k = k, jaccardBound = 0.10, rankFactor = 8,
      weightDeltaBound = 2.8).collect().head
    assert(!broken.getAs[Boolean]("sel_jaccard_ok") ||
      !broken.getAs[Boolean]("twin_rank_ok") ||
      !broken.getAs[Boolean]("twin_weight_ok"),
      "a constant-bucket hash must flip the q_dsir_select_xx certificate")
  }

  test("docCertificate: doc-level recall — the later twin must be flagged " +
      "as SOME duplicate, not necessarily of the identical doc") {
    // docs 2 and 6 have earlier identical twins (1 and 5)
    val ok = Differential.docCertificate(docs, "doc_id", "text",
      hits(2L -> 1L, 6L -> 3L), // 6 flagged against a non-twin: still caught
      hits(2L -> 1L, 6L -> 3L),
      jaccardBound = 0.9, recallBound = 0.9).collect().head
    assert(ok.getAs[Long]("n_exact_dup_docs") == 2)
    assert(ok.getAs[Boolean]("exact_dup_recall_ok") &&
      ok.getAs[Boolean]("pair_jaccard_ok"))
    val miss = Differential.docCertificate(docs, "doc_id", "text",
      hits(2L -> 1L), hits(2L -> 1L),
      jaccardBound = 0.9, recallBound = 0.9).collect().head
    assert(!miss.getAs[Boolean]("exact_dup_recall_ok"))
  }
}
