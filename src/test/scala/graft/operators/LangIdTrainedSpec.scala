package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Trained multi-class language ID: charSpread normalization, corpus
  * synthesis determinism, GD training determinism + separability on the
  * seeded corpus, the argmax tie rule, and generalization to sentences
  * outside the training rotations.
  */
class LangIdTrainedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def corpus(n: Int) =
    LangIdTrained.withFeatures(
      LangIdTrained.syntheticCorpus(
        spark.range(n.toLong).select(col("id").as("doc_id"))), "sent")

  private def trained(n: Int = 20 * LangIdTrained.NumLangs) =
    LangIdTrained.train(corpus(n), "doc_id", "feats", "lang_k",
      LangIdTrained.LangVocab.map(_._1), rounds = 24, lr = 4.0,
      maxSample = n)

  test("SpreadWs constant and the kernel's isSpreadWs accept the identical codepoint set") {
    val fromConst = LangIdTrained.SpreadWs.codePoints().toArray.toSet
    val accepted = (0 to 0x3000).filter(LangIdTrained.isSpreadWs).toSet
    assert(accepted === fromConst)
  }

  test("charSpread: lowercase, whitespace collapse to _, padding, per-char spread") {
    val out = Seq(("A  cat", "žluté")).toDF("a", "b")
      .select(LangIdTrained.charSpread(col("a")).as("sa"),
        LangIdTrained.charSpread(col("b")).as("sb"))
      .head()
    assert(out.getString(0) === "_ a _ c a t _")
    assert(out.getString(1) === "_ ž l u t é _")
  }

  test("syntheticCorpus: deterministic, label = doc_id % K, rotation by doc_id // K") {
    val k = LangIdTrained.NumLangs
    val c = LangIdTrained.syntheticCorpus(
      spark.range(2L * k + 8).select(col("id").as("doc_id")))
      .orderBy("doc_id").collect()
    assert(c.length === 2 * k + 8)
    c.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (id % k).toInt)
      val vocab = LangIdTrained.LangVocab((id % k).toInt)._2
      val expected = (0 until LangIdTrained.SentenceWords)
        .map(j => vocab(((id / k) + j).toInt % vocab.size))
        .mkString(" ")
      assert(r.getString(3) === expected, s"doc $id")
    }
  }

  test("training is deterministic: two runs produce the identical model") {
    val m1 = trained()
    val m2 = trained()
    assert(m1 === m2)
  }

  test("the trained model separates all 64 languages on the seeded corpus") {
    val feats = corpus(20 * LangIdTrained.NumLangs)
    val scored = LangIdTrained.score(feats, "feats", trained())
    val bad = scored.filter(col("lang_pred") =!= col("lang")).count()
    assert(bad === 0L, "every doc of the training corpus must classify correctly")
  }

  test("argmax ties resolve to the FIRST class index (the oracle's ORDER BY m DESC, c ASC)") {
    val model = LangIdTrained.MulticlassModel(
      weights = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0)),
      biases = Seq(0.0, 0.0, 0.0), labels = Seq("aa", "bb", "cc"))
    val scored = LangIdTrained.score(
      Seq((1L, Seq(1.0, 0.0))).toDF("id", "feats"), "feats", model)
      .select("lang_pred").head()
    // classes aa and bb tie at margin 1.0 — aa (smaller index) wins
    assert(scored.getString(0) === "aa")
  }

  test("generalizes to sentences outside the training rotations") {
    val model = trained()
    val fresh = Seq(
      (0L, "en", "it was the house that stood for all of that and more"),
      (1L, "de", "nicht der hund ist mit sich auf und von der katze"),
      (2L, "fr", "dans le jardin pour les fleurs et une belle maison pas"),
      (3L, "ru", "и в доме не на что это как по но и с"),
      (4L, "fi", "ja talo on että se ei oli mutta kun hän niin"),
      (5L, "tr", "bir ev ve bu da ne için ile daha çok olarak"))
      .toDF("doc_id", "expect", "sent")
    val scored = LangIdTrained.score(
      LangIdTrained.withFeatures(fresh, "sent"), "feats", model)
    val bad = scored.filter(col("lang_pred") =!= col("expect")).count()
    assert(bad === 0L)
  }

  test("fused CharTrigramEmbed == composed charSpread->wordNgrams->HashEmbedVector, both hash modes") {
    // real corpus text + hostile strings: whitespace classes (incl. the
    // three line terminators Java `.` excludes), CJK, combining marks,
    // emoji (supplementary plane), null, empty, all-whitespace
    val hostile = Seq(
      (1000L, null.asInstanceOf[String]), (1001L, ""), (1002L, " \t\n\f\r"),
      (1003L, "a bc d"), (1004L, "Grüße znaš 北京 тест"),
      (1005L, "emoji 😀 mixed"), (1006L, "ab"),
      (1007L, "  padded   runs\t\tof ws  "),
      (1008L, "a\u2028bc\u0085\u000Bde"))
      .toDF("doc_id", "text")
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (md5 <- Seq(true, false)) {
      val base = hostile.unionByName(real)
      val fused =
        if (md5) LangIdTrained.withFeatures(base, "text")
        else LangIdTrained.withFeaturesXx(base, "text")
      val ref = LangIdTrained.withFeaturesReference(base, "text",
        md5Mode = md5, outCol = "ref_feats")
      val joined = fused.select(col("doc_id"), col("feats"))
        .join(ref.select(col("doc_id"), col("ref_feats")), Seq("doc_id"))
      val diff = joined.filter(not(col("feats") <=> col("ref_feats"))).count()
      assert(diff === 0L, s"md5Mode=$md5: fused kernel diverged from reference")
    }
  }

  test("MulticlassArgmax: interpreted eval == codegen, and the degenerate-input contract") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val m = LangIdTrained.MulticlassModel(
      weights = Seq(Seq(1.0, -2.0), Seq(0.5, 0.5), Seq(-1.0, 3.0)),
      biases = Seq(0.25, 0.0, -0.5), labels = Seq("aa", "bb", "cc"))
    val rows = Seq(
      Row(1L, Seq(1.0, 0.0)), // aa wins (1.25 vs 0.5 vs -1.5)
      Row(2L, Seq(0.0, 1.0)), // cc wins (-1.75 vs 0.5 vs 2.5)
      Row(3L, null), // null vector -> null
      Row(4L, Seq(1.0, 2.0, 3.0)), // wrong width -> null
      Row(5L, Seq(Double.NaN, 1.0))) // NaN margin -> null
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("feats", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    def collect(codegen: Boolean): Seq[(Long, Any, Any)] = {
      val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try LangIdTrained.score(df, "feats", m)
        .select("id", "lang_pred", "margin_best")
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq
        .sortBy(_._1)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = collect(codegen = true)
    val interp = collect(codegen = false)
    assert(gen === interp, "interpreted eval diverged from codegen")
    val byId = gen.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 === "aa" && byId(2L)._2 === "cc")
    assert(byId(3L)._2 == null && byId(4L)._2 == null &&
      byId(5L)._2 == null, "degenerate inputs must yield NULL, never a label")
  }

  test("pinned model == retrained model (literal drift fails the build)") {
    // the committed LangIdPinned literals must equal a fresh run of the
    // exact training procedure they document — Double.toString literals
    // round-trip bit-exactly through scalac, so this is exact equality,
    // not a tolerance check
    val m = graft.tools.GenLangIdPinned.trainPinned(spark)
    assert(m.labels === LangIdPinned.Model.labels)
    assert(m.biases === LangIdPinned.Model.biases)
    assert(m.weights === LangIdPinned.Model.weights)
  }

  test("withLangPinned gates raw text deterministically and survives filter pushdown") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val scored = LangIdTrained.withLangPinned(docs, "text")
    // the gate shape composites use: filter on the prediction — this
    // pushes the predicate through the scoring projection (the K=32
    // janino-OOM regression shape MulticlassArgmax exists to survive)
    val kept = scored.filter(col("lang_pred") === "en").count()
    val total = docs.count()
    assert(kept > 0L && kept <= total)
    // deterministic across runs
    val again = LangIdTrained.withLangPinned(docs, "text")
      .filter(col("lang_pred") === "en").count()
    assert(again === kept)
  }

  test("withLangPinned never destroys a caller's pre-existing margin_best/lang_pred columns") {
    import spark.implicits._
    // a frame that ALREADY carries the public score-output names —
    // routing through score() would materialize-and-drop them; the
    // pinned gate must only touch its own `out` column
    val df = Seq((1L, "the quick brown fox", 9.75, "keepme"))
      .toDF("doc_id", "text", "margin_best", "lang_pred")
    val out = LangIdTrained.withLangPinned(df, "text", out = "gate_lang")
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Double]("margin_best") === 9.75,
      "caller's margin_best was destroyed")
    assert(r.getAs[String]("lang_pred") === "keepme",
      "caller's lang_pred was destroyed")
    assert(r.getAs[String]("gate_lang") != null)
  }

  test("MulticlassArgmax compares by model CONTENT (canonicalization can unify two builds)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types._
    // two structurally identical expressions built from SEPARATE Seq
    // instances must be equal (JVM-array params would compare by
    // reference and defeat Catalyst subexpression elimination)
    def mk() = graft.functions.MulticlassArgmax(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      Vector(Vector(1.0, 2.0), Vector(3.0, 4.0)),
      Vector(0.1, 0.2), Vector("aa", "bb"))
    val (e1, e2) = (mk(), mk())
    assert(e1 === e2, "structural equality failed")
    assert(e1.hashCode === e2.hashCode, "hashCode disagrees with equals")
    assert(e1.semanticEquals(e2), "semanticEquals failed")
  }

  test("a no-signal text still scores deterministically (zero vector -> bias argmax)") {
    val model = trained()
    val scored = LangIdTrained.score(
      LangIdTrained.withFeatures(Seq((0L, "")).toDF("doc_id", "sent"),
        "sent"), "feats", model)
      .select("lang_pred").collect()
    assert(scored.length === 1 && scored(0).getString(0) != null)
  }
}
