package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LangIdTrained

/** The fused-argmax K-scaling curve (the r19-verdict item 4): scoring
  * wall of [[graft.functions.MulticlassArgmax]] at K = 32/64/96/128
  * classes over PRE-STAGED features (the char-trigram kernel runs once
  * and is checkpointed out of the measurement), in the curation-gate
  * shape — score THEN FILTER on the prediction, so predicate pushdown
  * re-inlines the scorer exactly as the composites do. The row count is
  * amplified (`xRep` replicas per document) so the per-row kernel cost
  * dominates scheduling noise. A `base` pass (count over the staged
  * features, no scorer) isolates the scan+count overhead; the marginal
  * scoring cost is `kN - base`.
  *
  * Weights are synthetic and deterministic (the curve measures the
  * kernel's O(K*dim) arithmetic, not model quality); every class label
  * is distinct so the filter keeps a real fraction of rows.
  *
  * Usage: sbt "runMain graft.tools.ArgmaxKBench [sfDir] [reps] [xRep]"
  */
object ArgmaxKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val xRep = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val feats = LangIdTrained.withFeatures(docs, "text")
      .select("doc_id", "feats")
      .withColumn("__r", explode(sequence(lit(1), lit(xRep))))
      .repartition(cpus.toInt)
      .localCheckpoint(eager = true)
    val nRows = feats.count()
    def minOf(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    val base = minOf(feats.filter(col("doc_id") >= 0L).count())
    val dim = 64
    val walls = Seq(32, 64, 96, 128).map { k =>
      val labels = (0 until k).map(c => f"l$c%03d")
      val weights = Seq.tabulate(k, dim)((c, j) =>
        (((c * dim + j) * 2654435761L) % 17L - 8L).toDouble * 0.1)
      val biases = Seq.tabulate(k)(c => (c % 5 - 2) * 0.01)
      val m = LangIdTrained.MulticlassModel(weights, biases, labels)
      val keep = labels.take(math.max(1, k / 4))
      val w = minOf(
        LangIdTrained.score(feats, "feats", m)
          .filter(col("lang_pred").isin(keep: _*)).count())
      k -> w
    }
    val kjson = walls.map { case (k, w) => f""""k$k":$w%.3f""" }
      .mkString(",")
    println(f"""{"metric":"argmax_k_curve","rows":$nRows,"dim":$dim,"base":$base%.3f,$kjson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
