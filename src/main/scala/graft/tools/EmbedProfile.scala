package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: stage-by-stage timing of the text->embed->LSH
  * composite on a given dir (SCALE.md investigation aid).
  */
object EmbedProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val emb = time("hashEmbed+stage") {
      graft.operators.Dedup.stage(
        graft.operators.TextAnalysis.hashEmbed(docs, "doc_id", "text",
          dim = 256, n = 2))
    }
    time("cosineNearDups") {
      graft.operators.Dedup.cosineNearDups(emb, "doc_id", "vec",
        dim = 256, threshold = 0.6).count()
    }
    spark.stop()
  }
}
