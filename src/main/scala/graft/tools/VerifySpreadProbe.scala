package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B probe (r21): does AQE's byte-based partition coalescing
  * serialize the CPU-dense verify stage of the LSH pipelines, and does
  * pinning the verify joins' partitioning fix it? Times the
  * q_text_embed_neardup composite end to end with the stock
  * cosineNearDups against an inlined variant whose verify joins are
  * explicitly repartitioned (REPARTITION_BY_NUM is exempt from AQE
  * coalescing), and prints both row counts + checksums to prove
  * identical output.
  *
  *   sbt "runMain graft.tools.VerifySpreadProbe /root/testdata/sf0.1 5"
  */
object VerifySpreadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "2"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Similarity, TextAnalysis}

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // the stock query
    def stock(): DataFrame = {
      val emb = Dedup.stage(TextAnalysis.hashEmbedMd5(
        docs, "doc_id", "text", dim = 256, n = 2))
      Dedup.cosineNearDups(emb, "doc_id", "vec", dim = 256, threshold = 0.6)
        .select(col("id_a"), col("id_b"),
          (floor(col("cosine") * 1e6d + 0.5d) / 1e6d).as("cosine_r"))
        .orderBy("id_a", "id_b")
    }

    // inlined cosineNearDups with pinned verify partitioning
    def pinned(): DataFrame = {
      val emb = Dedup.stage(TextAnalysis.hashEmbedMd5(
        docs, "doc_id", "text", dim = 256, n = 2))
      val (idCol, vecCol, dim, threshold, planesPerTable, tables, maxBucket,
        seed) = ("doc_id", "vec", 256, 0.6, 4, 8, 256, 42L)
      val planes = graft.functions.LshExpressions.planeMatrix(
        dim, planesPerTable * tables, seed)
      val prepared = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      val banded = prepared
        .select(col("id"), posexplode(
          graft.functions.LshExpressions.hyperplaneBuckets(
            col("vec"), planes, planesPerTable)))
        .toDF("id", "table", "bucket")
      // boundedPairs inline (persist managed manually)
      val statsWindow = Window.partitionBy(col("table"), col("bucket"))
      val withN = banded
        .withColumn("__n", count(lit(1)).over(statsWindow))
        .withColumn("__minid", min(col("id")).over(statsWindow))
        .persist()
      val small = withN.filter(col("__n") <= maxBucket)
      val a = small.select(col("table"), col("bucket"), col("id").as("id_a"))
      val b = small.select(col("table"), col("bucket"), col("id").as("id_b"))
      val smallPairs = a.join(b, Seq("table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val bigPairs = withN
        .filter(col("__n") > maxBucket && col("id") =!= col("__minid"))
        .select(col("__minid").as("id_a"), col("id").as("id_b"))
      val cands0 = smallPairs.union(bigPairs).distinct()
      // THE CHANGE: pin the verify joins' partitioning
      val p = math.max(spark.sessionState.conf.numShufflePartitions,
        spark.sparkContext.defaultParallelism)
      val cands = cands0.repartition(p, col("id_a"))
      val va = prepared.select(col("id").as("id_a"), col("vec").as("vec_a"),
        Similarity.norm(col("vec")).as("__na"))
      val vb = prepared.select(col("id").as("id_b"), col("vec").as("vec_b"),
        Similarity.norm(col("vec")).as("__nb"))
      val joined = cands.join(va, "id_a")
        .repartition(p, col("id_b"))
        .join(vb, "id_b")
        .withColumn("cosine", Similarity.dot(col("vec_a"), col("vec_b")) /
          (col("__na") * col("__nb")))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
      val snap = try Dedup.stage(joined) finally withN.unpersist(false)
      snap
        .select(col("id_a"), col("id_b"),
          (floor(col("cosine") * 1e6d + 0.5d) / 1e6d).as("cosine_r"))
        .orderBy("id_a", "id_b")
    }

    // prove identical output once
    val s0 = stock(); val p0 = pinned()
    val cs = s0.agg(sum(xxhash64(col("id_a"), col("id_b"),
      col("cosine_r").cast("string")))).first().getLong(0)
    val cp = p0.agg(sum(xxhash64(col("id_a"), col("id_b"),
      col("cosine_r").cast("string")))).first().getLong(0)
    println(s"[probe] checksum stock=$cs pinned=$cp equal=${cs == cp} " +
      s"rows stock=${s0.count()} pinned=${p0.count()}")
    clear()

    for (r <- 1 to reps) {
      clear()
      var t0 = System.nanoTime()
      noop(stock())
      val tStock = (System.nanoTime() - t0) / 1e9
      clear()
      t0 = System.nanoTime()
      noop(pinned())
      val tPinned = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep $r stock=$tStock%.3f pinned=$tPinned%.3f")
    }
    spark.stop()
  }
}
