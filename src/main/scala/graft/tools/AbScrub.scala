package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B cost probe for the unified scrub (q_scrub_composite vs the
  * three standalone exact-substring removers) — the measurement the
  * r18 verdict asked for. Three contenders, identical bench-session
  * config:
  *
  *  - `independent x3`: the three scrubs each over the ORIGINAL corpus
  *    (what the three standalone queries measure — NOT what a pipeline
  *    runs, since their outputs disagree and never compose);
  *  - `chained serial`: CDC scrub -> long-repeat scrub on its output ->
  *    span scrub on that — the semantically comparable serial pipeline
  *    (each stage re-reads and re-WRITES the full corpus);
  *  - `composite`: Corpus.scrubComposite — one fused walk, one
  *    hot-region anchor cut, one union-span reassembly, one token cut.
  *
  * Run: sbt "runMain graft.tools.AbScrub [sfDir] [reps]"
  */
object AbScrub {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Corpus
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.count() // warm-up

    def cdcScrubDf(in: DataFrame, idc: String, tc: String): DataFrame = {
      val chunks = Corpus.cdcChunks(in, idc, tc)
      val dup = chunks.groupBy("chunk")
        .agg(count_distinct(col("id")).as("nd")).filter(col("nd") > 1)
        .select("chunk")
      val re = chunks.join(dup, Seq("chunk"), "left_anti")
        .groupBy(col("id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), "").as("clean_text"))
      in.select(col(idc).cast("long").as("id")).join(re, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
    }

    def time(label: String)(run: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = run
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-22s min=${times.map(_._1).min}%.3f s  " +
        f"n=${times.head._2}  all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }

    time("independent x3") {
      cdcScrubDf(docs, "doc_id", "text").count() +
        Corpus.scrubLongRepeats(docs, "doc_id", "text", md5Mode = true)
          .count() +
        Corpus.maskRepeatedSpans(docs, "doc_id", "text", 8, 2).count()
    }
    time("chained serial") {
      val c1 = cdcScrubDf(docs, "doc_id", "text")
      val c2 = Corpus.scrubLongRepeats(c1, "doc_id", "clean_text",
        md5Mode = true).select(col("doc_id"), col("clean_text"))
      Corpus.maskRepeatedSpans(c2, "doc_id", "clean_text", 8, 2).count()
    }
    time("composite") {
      Corpus.scrubComposite(docs, "doc_id", "text", md5Mode = true).count()
    }
    spark.stop()
  }
}
