package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-dev filter: SPARK_GRAFT_ONLY=q_a,q_b runs a subset (the
    // driver never sets it; scripts/check_oracle.py replays the subset)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ran = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    ran.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // surrogate-safe truncation: cutting a non-BMP char in half would
        // make the meta JSON unencodable and crash the very report that
        // exists to surface failures
        val msg = String.valueOf(e.getMessage).take(500)
        failed(name) =
          if (msg.nonEmpty && Character.isHighSurrogate(msg.last)) msg.dropRight(1)
          else msg
      }
      // release checkpoint-backed results (dedup pipelines) between
      // queries so a 60-query run doesn't accumulate executor blocks
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // declared-vs-written sidecar: a query that crashes before its parquet
    // lands would otherwise just VANISH from the correctness surface (the
    // driver only compares dumps that exist) — the round-8/9 NTZ crashes
    // silently shrank 145 declared rows to 143 checked and nothing in the
    // artifacts said so. This makes the shrink (and its cause) visible.
    val meta = Seq(
      s"${q("n_declared")}: ${SparkEntry.queries.size}",
      s"${q("n_run")}: ${ran.size}",
      s"${q("n_written")}: ${ran.size - failed.size}",
      s"${q("failed")}: " + failed
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    ).mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"), meta)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size}/${ran.size} queries FAILED: " +
        failed.keys.mkString(", "))
    spark.stop()
  }
}
