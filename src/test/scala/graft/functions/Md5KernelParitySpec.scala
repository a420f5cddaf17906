package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession
import graft.operators.Dedup

/** Bit-parity of the native md5 kernels against the relational
  * formulations they replaced — the same retained-reference pattern as
  * ShingleHashes vs shingleHashesReference. The md5 twins' ENTIRE
  * oracle story rests on these bits matching what DuckDB computes from
  * `md5 + substring + BIGINT`, so the kernels must equal the hex-parse
  * forms exactly, on real corpus text and on the edge shapes
  * (null/empty text, fewer-than-k tokens, separator runs, multi-byte
  * UTF-8).
  */
class Md5KernelParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val edges = Seq(
    1L -> null.asInstanceOf[String],
    2L -> "",
    3L -> "one",
    4L -> "one two",
    5L -> "  leading and   multiple   separator\truns\n",
    6L -> "naïve café über straße 日本語 テスト mixed ascii",
    7L -> ("repeat the shingle " * 10).trim)

  test("minhashIndexMd5 kernel == relational reference (sh and sig), " +
      "corpus + edge shapes, both default and 16x2 banding") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(edges.toDF("doc_id", "text"))
    for ((bands, rows) <- Seq((8, 4), (16, 2))) {
      val got = Dedup.minhashIndexMd5(docs, "doc_id", "text", bands, rows)
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2)))
        .toMap
      val want = Dedup
        .minhashIndexMd5Reference(docs, "doc_id", "text", bands, rows)
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2)))
        .toMap
      assert(got.keySet == want.keySet)
      val bad = got.keys.filter(id => got(id) != want(id)).take(3)
      assert(bad.isEmpty,
        s"${bands}x$rows: kernel diverged on ids $bad — " +
          bad.map(id => s"$id: got=${got(id)} want=${want(id)}").mkString("; "))
    }
  }

  test("minhashSigMd5Frame == minhashIndexMd5 signatures on the same text") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", lit(1).as("carried"))
    val viaFrame = Dedup.minhashSigMd5Frame(docs, "text",
        Seq("doc_id", "carried"), 32, 3)
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaIndex = Dedup.minhashIndexMd5(docs, "doc_id", "text")
      .select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaFrame == viaIndex)
  }

  test("kernel == reference on randomized corpora (seeds x shapes: " +
      "token runs, unicode mixes, dup-heavy, single-token)") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector.tabulate(40)(i => s"w$i") ++
      Vector("日本", "straße", "café", "ÄÖÜ", "a", "", " ")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(30)
      val toks = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      // random separator runs between tokens
      val sep = () => Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4))
      (i.toLong, toks.map(t => t + sep()).mkString.dropRight(1))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashIndexMd5(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val want = Dedup.minhashIndexMd5Reference(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val bad = got.keys.filter(id => got(id) != want(id)).take(3).toSeq
    assert(bad.isEmpty, s"kernel diverged on randomized docs $bad: " +
      bad.map(id => s"$id '${docs(id.toInt)._2.take(60)}'").mkString("; "))
  }

  test("scalar md5Hash64 == hex-parse halves on corpus tokens") {
    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(lower($"text")), "\\s+")).as("t"))
      .unionByName(Seq("", "a", "ÄÖÜ", "日本語").toDF("t"))
      .distinct()
    val rows = toks.select(
        $"t",
        Md5Hashes.md5Hash64($"t").as("packed"),
        conv(substring(md5($"t".cast("binary")), 1, 8), 16, 10)
          .cast("long").as("hi"),
        conv(substring(md5($"t".cast("binary")), 9, 8), 16, 10)
          .cast("long").as("lo"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val packed = r.getLong(1)
      assert((packed >>> 32) == r.getLong(2) &&
        (packed & 0xFFFFFFFFL) == r.getLong(3),
        s"token '${r.getString(0)}': packed=$packed hi=${r.getLong(2)} lo=${r.getLong(3)}")
    }
  }

  test("DSIR md5 bucket kernel (shiftrightunsigned of md5Hash64) == " +
      "relational conv(substring(md5)) chain, corpus features + edges") {
    val feats = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.operators.TextAnalysis.wordNgrams(
        $"text", 2, seg = false)).as("f"))
      .unionByName(Seq("", "a", "straße café", "日本 語").toDF("f"))
      .distinct()
    for (buckets <- Seq(7L, 1024L)) {
      val bad = feats.select(
          pmod(conv(substring(md5($"f".cast("binary")), 1, 8), 16, 10)
            .cast("long"), lit(buckets)).as("ref"),
          pmod(shiftrightunsigned(Md5Hashes.md5Hash64($"f"), 32),
            lit(buckets)).as("got"))
        .filter(not($"ref" <=> $"got"))
        .count()
      assert(bad == 0L, s"bucket kernel diverged on $bad features at " +
        s"buckets=$buckets")
    }
  }

  test("Md5MinHashSig == the relational transform/array_min staging, " +
      "including the null-element and no-usable-element shapes") {
    val h = 32
    val rnd = new scala.util.Random(20260819L)
    val arrays: Seq[Seq[java.lang.Long]] =
      Seq(Seq.empty[java.lang.Long], Seq(null.asInstanceOf[java.lang.Long]),
        Seq[java.lang.Long](0L, -1L, Long.MaxValue, Long.MinValue)) ++
        (0 until 50).map(_ => Seq.fill(1 + rnd.nextInt(40))(
          java.lang.Long.valueOf(rnd.nextLong())))
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "h64")
    val got = df.select($"id", Md5Hashes.md5MinHashSig($"h64", h).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val want = df.select($"id",
        transform(sequence(lit(0), lit(h - 1)), i =>
          array_min(transform($"h64", x =>
            (shiftrightunsigned(x, 32) +
              i.cast("long") * x.bitwiseAND(lit(4294967295L))) %
              lit(4294967296L)))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(got == want)
  }
}
