package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** Verification of the non-oracle operators against exact recomputation
  * (SURVEY §5.3): LSH dedup vs exact O(n^2) similarity, as-of join vs a
  * naive per-row scan, IVF vs brute force, the multimodal decode stub.
  */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  test("minhash LSH finds exactly the exact-Jaccard pairs at high recall config") {
    val sample = docs.filter($"doc_id" < 150)
    // exact all-pairs jaccard over the sample
    val a = sample.select($"doc_id".as("id_a"), $"text".as("ta"))
    val b = sample.select($"doc_id".as("id_b"), $"text".as("tb"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("j", Dedup.jaccard($"ta", $"tb"))
      .filter($"j" >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(sample, "doc_id", "text",
      threshold = 0.5, bands = 16, rows = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH reported a pair below threshold")
    assert(exact == lsh, s"recall gap: missed ${(exact -- lsh).size} of ${exact.size}")
    assert(exact.nonEmpty, "test vacuous: no near-dup pairs in sample")
  }

  test("simhash: identical text -> distance 0; small perturbation -> small distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different content about spark query engines at scale")
    ).toDF("id", "text")
    val sigs = df.select($"id", Dedup.simhash($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
    val cands = Dedup.simhashCandidates(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(cands.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
  }

  test("fingerprint: equal token stream <-> equal fingerprint on test docs") {
    val fps = docs.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
    val nDocs = fps.count()
    val nFps = fps.select("fp").distinct().count()
    val nTexts = docs.select("text").distinct().count()
    assert(nFps == nTexts, s"fingerprint collisions: $nFps fps for $nTexts texts")
    assert(nDocs == 500)
  }

  test("as-of join matches a naive per-row computation") {
    val ev = graft.queries.Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("p_id"))
    val got = AsOfJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
      Map("p_event" -> "p_id"))
      .select("event_id", "p_event").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive: for each click, scan all purchases of that user
    val ps = purchases.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val naive = clicks.collect().map { c =>
      val (id, uid, ts) = (c.getLong(0), c.getLong(1), c.getTimestamp(2))
      val prior = ps.filter(p => p._1 == uid && !p._2.after(ts))
      id -> (if (prior.isEmpty) -1L else prior.maxBy(p => (p._2.getTime, p._2.getNanos))._3)
    }.toMap
    assert(got == naive)
  }

  test("IVF top-k has full recall with all cells probed; subset recall otherwise") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = graft.queries.PipelineQueries.fixedQueryVector
    val cents = graft.queries.PipelineQueries.ivfCentroids
    val brute = Similarity.topK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val full = Similarity.topKIvf(emb, "vec_id", "embedding", cents, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute, "nprobe=all must equal brute force")
    val partial = Similarity.topKIvf(emb, "vec_id", "embedding", cents, q, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(partial.intersect(brute.toSet).size >= 5, "IVF recall collapsed")
  }

  test("multimodal: payload decode stub is deterministic and total") {
    val df = Multimodal.withPayload(docs.limit(50), "text", "payload")
    val meta = Multimodal.decodeImages(df, "doc_id", "payload")
    val rows = meta.select($"id", $"meta.width", $"meta.height", $"meta.channels",
      $"meta.byte_len").collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getInt(1) >= 32 && r.getInt(1) < 544))
    assert(rows.forall(r => r.getInt(3) == 3))
    // deterministic across runs
    val again = Multimodal.decodeImages(df, "doc_id", "payload")
      .select($"id", $"meta.width").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val first = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first == again)
  }

  test("multimodal: frame sample plan explodes the expected frame indices") {
    val vids = Seq((1L, 10L), (2L, 100L)).toDF("vid", "n_frames")
    val plan = Multimodal.frameSamplePlan(vids, "vid", "n_frames", stride = 5, maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plan.filter(_._1 == 1L).map(_._2).toSeq == Seq(0L, 5L))
    assert(plan.filter(_._1 == 2L).map(_._2).toSeq == (0L until 40L by 5L).toSeq)
  }
}
