package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"value":...,"queries":{...}}.
  *
  * local[32] with 32 shuffle partitions (matching cores — the 200 default
  * over-partitions a single node); AQE on for runtime coalesce/skew
  * handling, exactly the posture a real cluster run would use.
  *
  * Timing methodology (storm-proof):
  * this host suffers multi-minute vCPU-migration storms (CPU steal) that
  * can inflate wall time 10-170x. Two defenses, layered:
  *
  *  1. INTERLEAVED rep passes. Reps of a query are NOT run back-to-back
  *     (a single storm would then cover every rep and min-of-reps fails
  *     exactly when it is needed). Instead pass 1 runs ALL queries, then
  *     pass 2, then pass 3; per-query time is the min across passes, so a
  *     storm lasting minutes poisons at most one pass of each query.
  *  2. /proc/stat contamination flags. Around each rep we read the
  *     aggregate cpu line and compute the steal+iowait share of total
  *     jiffies during the rep; a rep above STEAL_THRESHOLD is marked
  *     contaminated. Queries whose BEST (min) rep is contaminated get one
  *     extra interleaved retry pass; any query still without a clean best
  *     rep is listed in the artifact's "contaminated" array so a consumer
  *     never mistakes a storm reading for engine cost.
  */
object Bench {

  /** steal+iowait and total jiffies from the aggregate cpu line. */
  private def cpuStat(): (Long, Long) = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        val iowait = if (f.length > 4) f(4) else 0L
        val steal = if (f.length > 7) f(7) else 0L
        (steal + iowait, f.sum)
      } finally src.close()
    } catch { case _: Throwable => (0L, 0L) } // non-Linux: no flagging
  }

  /** share of jiffies stolen/blocked during a rep above which the rep's
    * wall time is environmental noise, not engine cost */
  private val StealThreshold = 0.05

  private final case class Rep(sec: Double, ok: Boolean, stealFrac: Double) {
    def contaminated: Boolean = stealFrac > StealThreshold
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up actions so JVM/codegen startup isn't billed to the first
    // query: a scan plus a small decimal groupBy-agg (compiles the
    // hash-agg + decimal codegen paths the first real queries use)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("r_regionkey").cast("decimal(27,6)")))
      .count()

    def runOne(d: graft.queries.QueryDef): Rep = {
      // each rep is billed standalone: no cross-query/rep cache reuse.
      // Checkpoint-backed results (the dedup pipelines) live as persisted
      // RDDs outside the cacheManager — drop those blocks too.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val (bad0, tot0) = cpuStat()
      val t0 = System.nanoTime()
      val repOk =
        try { d.fn(spark, sfDir).count(); true }
        catch {
          case t: Throwable =>
            System.err.println(s"[bench] FAILED ${d.name}: ${t.getMessage}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val (bad1, tot1) = cpuStat()
      val frac = if (tot1 > tot0) (bad1 - bad0).toDouble / (tot1 - tot0) else 0.0
      Rep(sec, repOk, frac)
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val defs = SparkEntry.defs
    val table = Array.fill(defs.length)(Vector.empty[Rep])
    for (pass <- 1 to reps) {
      defs.zipWithIndex.foreach { case (d, i) =>
        val r = runOne(d)
        table(i) :+= r
        System.err.println(f"[bench] pass $pass/$reps ${d.name}%-22s ${r.sec}%8.2fs" +
          f"  steal=${r.stealFrac * 100}%.1f%%${if (r.contaminated) " CONTAMINATED" else ""}${if (r.ok) "" else " FAILED"}")
      }
    }
    // one interleaved retry pass over queries whose best successful rep is
    // contaminated — a storm during the retry then only re-flags, never
    // silently ships a poisoned min
    val needRetry = defs.indices.filter { i =>
      val ok = table(i).filter(_.ok)
      ok.nonEmpty && ok.minBy(_.sec).contaminated
    }
    if (needRetry.nonEmpty) {
      System.err.println(s"[bench] retry pass for ${needRetry.length} contaminated queries")
      needRetry.foreach { i => table(i) :+= runOne(defs(i)) }
    }

    val results = defs.zipWithIndex.map { case (d, i) =>
      val runs = table(i)
      // a rep's time is only a measurement when the rep SUCCEEDED — a
      // fast crash must not undercut a valid slow run; a query counts as
      // ok when every rep succeeded (a flaky query is a failure signal)
      val okRuns = runs.filter(_.ok)
      val ok = okRuns.length == runs.length
      val best =
        if (okRuns.nonEmpty) okRuns.minBy(_.sec) else runs.minBy(_.sec)
      System.err.println(f"[bench] ${d.name}%-22s ${best.sec}%8.2fs  (min of ${runs.length})" +
        s"${if (best.contaminated) "  CONTAMINATED" else ""}${if (ok) "" else "  FAILED"}")
      (d.name, best.sec, ok, best.contaminated)
    }
    // a failed query is reported with a NEGATIVE time so it can never read
    // as a fast successful run; the failed names are listed explicitly,
    // and the headline total counts SUCCESSFUL queries only (a consumer
    // reading just the total must not mistake a failing run for a fast one)
    val qs = results.map { case (k, v, ok, _) => "\"" + k + "\":" + (if (ok) v else -v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val contaminated = results.collect { case (k, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    val nFailed = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"n_failed":$nFailed,"contaminated":$contaminated,"n_contaminated":${results.count(_._4)},"reps":$reps,"timing":"min_of_interleaved_passes","steal_threshold":$StealThreshold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
