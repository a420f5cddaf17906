package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Skew evidence for [[graft.operators.ScaleOps.temperatureMixSample]]:
  * run the mixer over a ~1000:1 domain-skewed corpus (one giant domain
  * holding ~95% of all rows + 50 small domains) and print per-stage
  * shuffle accounting — total vs MAX-TASK shuffle read — so the claim
  * "the giant domain spreads over `fanout` reducers, no stage funnels it
  * through one task" is measured, not asserted. The quota table is
  * |domains|-sized by construction (one row per distinct domain); the
  * tool prints the distinct-domain count next to the output size so the
  * two bounded frames are visible in the same artifact.
  *
  *   sbt "runMain graft.tools.MixSkew /root/testdata/sf0.1 1x"
  *   sbt "runMain graft.tools.MixSkew target/scale100x 100x"
  *
  * Output: one JSON line per stage that moved shuffle data
  * (tasks, total read MB, max single-task read MB), then one summary
  * line (wall, output rows, |domains|, giant-domain share).
  */
object MixSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = args.lift(1).getOrElse(dir)
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

    // ~1000:1 skew: doc_id % 20 == 0 -> one of 50 small domains (~0.1%
    // of rows each); everything else -> the giant domain (~95%)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("domain",
        when(pmod(col("doc_id"), lit(20)) === 0,
          concat(lit("small_"),
            pmod(floor(col("doc_id") / 20), lit(50)).cast("int")))
          .otherwise(lit("giant")))
    docs.count() // warm up

    // diagnostics BEFORE the listener attaches: these jobs shuffle too,
    // and their stages would otherwise print as mixer evidence rows
    val nDomains = docs.select("domain").distinct().count()
    val giant = docs.filter(col("domain") === "giant").count()
    val total = docs.count()

    // per-stage, per-task shuffle-read accounting
    final case class St(var tasks: Int = 0, var read: Long = 0L,
      var maxRead: Long = 0L, var write: Long = 0L)
    val stages = TrieMap.empty[Int, St]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            val s = stages.getOrElseUpdate(te.stageId, St())
            s.synchronized {
              val r = m.shuffleReadMetrics.totalBytesRead
              s.tasks += 1
              s.read += r
              if (r > s.maxRead) s.maxRead = r
              s.write += m.shuffleWriteMetrics.bytesWritten
            }
          }
        }
      })

    val t0 = System.nanoTime()
    val out = graft.operators.ScaleOps.temperatureMixSample(
      docs, "domain", "doc_id", budget = 200L)
    val nOut = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // drain the listener bus

    def mb(b: Long): Double = b / 1048576.0
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      if (s.read > 0 || s.write > 0)
        println(f"""{"label":"$label","stage":$id,"tasks":${s.tasks},"read_mb":${mb(s.read)}%.2f,"max_task_read_mb":${mb(s.maxRead)}%.2f,"write_mb":${mb(s.write)}%.2f}""")
    }
    println(f"""{"label":"$label","op":"mix_sample_skew","sec":$sec%.3f,"rows":$nOut,"n_domains":$nDomains,"giant_share":${giant.toDouble / total}%.4f}""")
    spark.stop()
  }
}
