package graft.core

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run. */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Pid-keyed scratch path for test fixtures: a concurrent or orphaned
    * test JVM sharing the machine cannot clobber this run's files (the
    * hazard that once poisoned a fixed checkpoint-dir assert).
    */
  def tmpPath(name: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"${base.stripSuffix("/")}/graft-test-pid${ProcessHandle.current().pid()}/$name"
  }
}
