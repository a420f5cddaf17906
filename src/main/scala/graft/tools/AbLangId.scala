package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B cost probe: marker-count language ID (TextAnalysis.withLangId,
  * the heuristic that gates every curation composite) vs the TRAINED
  * char-trigram classifier's scoring pass (LangIdTrained), both
  * aggregated over the full documents table — the measurement VERDICT
  * r17 asked for before swapping the composites' langid stage. Both
  * paths are one codegen'd map + one aggregate (zero data shuffles);
  * the question is per-row cost: 21 marker substring scans vs
  * char-spread regex + trigram hashing + 32 dot products. Run:
  *   sbt "runMain graft.tools.AbLangId [sfDir] [reps]"
  */
object AbLangId {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{LangIdTrained, TextAnalysis}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.count() // warm-up

    // the trained model: once, driver-side (composites would train once
    // and broadcast; only the SCORING pass rides the per-row hot path)
    val model = LangIdTrained.train(
      LangIdTrained.withFeatures(
        LangIdTrained.syntheticCorpus(docs.select("doc_id")), "sent"),
      "doc_id", "feats", "lang_k", LangIdTrained.LangVocab.map(_._1),
      rounds = 24, lr = 4.0, maxSample = 800)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.groupBy("lid").count().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${times.min}%.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("marker (withLangId)") {
      TextAnalysis.withLangId(docs, col("text"), "lid")
    }
    time("trained md5 (oracle twin)") {
      LangIdTrained.score(
        LangIdTrained.withFeatures(docs, "text"), "feats", model)
        .withColumnRenamed("lang_pred", "lid")
    }

    // production path: the xxhash64 kernel end to end (train + score on
    // the same feature space)
    val modelXx = LangIdTrained.train(
      LangIdTrained.withFeaturesXx(
        LangIdTrained.syntheticCorpus(docs.select("doc_id")), "sent"),
      "doc_id", "feats", "lang_k", LangIdTrained.LangVocab.map(_._1),
      rounds = 24, lr = 4.0, maxSample = 800)
    time("trained xx (production)") {
      LangIdTrained.score(
        LangIdTrained.withFeaturesXx(docs, "text"), "feats", modelXx)
        .withColumnRenamed("lang_pred", "lid")
    }
    spark.stop()
  }
}
