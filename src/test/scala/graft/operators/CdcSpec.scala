package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Content-defined chunking: the rolling-hash boundary contract
  * (hand-replayed reference), losslessness, the insertion-
  * resynchronization property that justifies CDC over fixed spans,
  * codepoint (not UTF-16) semantics, and determinism.
  */
class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)], window: Int = 8,
      divisor: Int = 32): Map[Long, Seq[String]] =
    Corpus.cdcChunks(rows.toDF("doc_id", "text"), "doc_id", "text",
        window, divisor)
      .orderBy("id", "chunk_idx")
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  /** independent reference: direct positional recompute of the contract */
  private def refBounds(text: String, window: Int, divisor: Int): Seq[Int] = {
    val cps = text.codePoints().toArray
    val g = Corpus.cdcWeights(window)
    val bs = (window to cps.length).filter { i =>
      val h = (0 until window).map(j => cps(i - 1 - j) * g(j)).sum
      h % Corpus.CdcMod % divisor == 0
    }
    (bs :+ cps.length).distinct
  }

  test("boundaries match the declared rolling-hash contract (independent recompute)") {
    val text = "the quick brown fox jumps over the lazy dog and then " +
      "keeps on running through the content defined chunking meadow"
    val got = chunksOf(Seq((1L, text)))(1L)
    val bounds = refBounds(text, 8, 32)
    val expect = (Seq(0) ++ bounds).sliding(2).map {
      case Seq(a, b) => text.substring(a, b) // pure-ASCII: cp == char
    }.toSeq
    assert(got === expect)
  }

  test("chunk concatenation reproduces the document exactly (incl. unicode + short texts)") {
    val texts = Seq(
      (1L, "short"), // shorter than the window: one chunk
      (2L, "日本語のテキストと English mixed " * 5),
      (3L, "emoji 😀🎉 and café, both spellings: café " * 4),
      (4L, "x"))
    val got = chunksOf(texts)
    texts.foreach { case (id, t) =>
      assert(got(id).mkString === t, s"doc $id")
      assert(got(id).nonEmpty)
    }
  }

  test("an insertion shifts only the local chunk and re-synchronizes (the point of CDC)") {
    val base = "lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua " +
      "ut enim ad minim veniam quis nostrud exercitation ullamco laboris " +
      "nisi ut aliquip ex ea commodo consequat duis aute irure dolor in " +
      "reprehenderit in voluptate velit esse cillum dolore eu fugiat"
    val edited = base.substring(0, 10) + "INSERTED" + base.substring(10)
    val a = chunksOf(Seq((1L, base)))(1L)
    val b = chunksOf(Seq((1L, edited)))(1L)
    // the tail chunk SEQUENCES re-synchronize: only the chunk containing
    // the edit (and possibly its neighbor) differs
    val n = a.size - 2
    assert(n > 2)
    assert(a.takeRight(n) === b.takeRight(n),
      s"expected resync of the last $n chunks")
    // while a FIXED-SPAN chunking of the same texts shares almost
    // nothing after the insertion (the contrast that motivates CDC)
    val fixedA = base.grouped(32).toSeq
    val fixedB = edited.grouped(32).toSeq
    assert(fixedA.toSet.intersect(fixedB.toSet).size <= 1)
  }

  test("codepoint semantics: supplementary-plane chars count once (not as surrogate pairs)") {
    // a text whose UTF-16 length differs from its codepoint length
    val t = "😀" * 20 + "abcdefgh" + "😀" * 20
    assert(t.length != t.codePointCount(0, t.length))
    val got = chunksOf(Seq((1L, t)))(1L)
    assert(got.mkString === t)
    // n_cp column counts codepoints
    val total = Corpus.cdcChunks(Seq((1L, t)).toDF("doc_id", "text"),
        "doc_id", "text")
      .agg(sum("n_cp")).as[Long].head()
    assert(total === t.codePointCount(0, t.length).toLong)
  }

  test("deterministic across runs and partitionings; empty/null text yields no rows") {
    val df = (1L to 40L).map(i => (i, s"document number $i " * 10))
      .toDF("doc_id", "text")
    val a = Corpus.cdcChunks(df.repartition(1), "doc_id", "text")
      .orderBy("id", "chunk_idx").collect().toSeq
    val b = Corpus.cdcChunks(df.repartition(7), "doc_id", "text")
      .orderBy("id", "chunk_idx").collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq))
    val n = Corpus.cdcChunks(
      Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text").count()
    assert(n === 0L)
  }
}
