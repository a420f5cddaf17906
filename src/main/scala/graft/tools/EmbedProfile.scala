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
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    // both hash modes, stage by stage: the embed walls isolate kernel
    // cost (XXH64 vs MD5), the LSH walls + bucket occupancy isolate
    // candidate volume (hash-dependent sign bits -> different bucket
    // distribution -> different capped-pair counts)
    import org.apache.spark.sql.functions._
    for (pass <- 1 to 2; (mode, embDf) <- Seq(
        ("xx", () => graft.operators.TextAnalysis.hashEmbed(
          docs, "doc_id", "text", dim = 256, n = 2)),
        ("md5", () => graft.operators.TextAnalysis.hashEmbedMd5(
          docs, "doc_id", "text", dim = 256, n = 2)))) {
      val emb = time(s"[p$pass $mode] hashEmbed+stage") {
        val e = graft.operators.Dedup.stage(embDf())
        e.count(); e
      }
      val pairs = time(s"[p$pass $mode] cosineNearDups") {
        graft.operators.Dedup.cosineNearDups(emb, "doc_id", "vec",
          dim = 256, threshold = 0.6).count()
      }
      // bucket occupancy under the SAME plane matrix the pipeline uses
      // (dim 256, 8 tables x 4 planes, seed 42): capped-pair volume is
      // sum over buckets of C(min(n, 256), 2) + star pairs for overflow
      val planes = graft.functions.LshExpressions.planeMatrix(256, 32, 42L)
      val sizes = emb.select(posexplode(
          graft.functions.LshExpressions.hyperplaneBuckets(
            col("vec"), planes, 4)))
        .toDF("table", "bucket")
        .groupBy("table", "bucket").count()
        .select(col("count")).collect().map(_.getLong(0))
      val cap = 256L
      val candPairs = sizes.map { n =>
        val m = math.min(n, cap); m * (m - 1) / 2 + math.max(0L, n - cap)
      }.sum
      println(s"[profile] [p$pass $mode] verified pairs=$pairs  buckets=${sizes.length}" +
        f"  max bucket=${sizes.max}  capped cand pairs=$candPairs")
      graft.operators.Dedup.free(emb)
    }
    spark.stop()
  }
}
