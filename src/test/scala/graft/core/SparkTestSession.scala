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
    * hazard that once poisoned a fixed checkpoint-dir assert). This run's
    * tree is deleted on JVM exit, and trees left by DEAD pids (crashed or
    * kill -9'd runs, which never reach their own hook) are swept on first
    * use — so repeated runs don't accumulate fixture data under tmp.
    */
  def tmpPath(name: String): String = s"$tmpRoot/$name"

  private lazy val tmpRoot: String = {
    val base = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree))
      f.delete()
    }
    Option(base.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft-test-pid"))
      .foreach { d =>
        val alive = d.getName.stripPrefix("graft-test-pid").toLongOption
          .exists(p => {
            val h = ProcessHandle.of(p)
            h.isPresent && h.get.isAlive
          })
        if (!alive) rmTree(d)
      }
    val mine = new java.io.File(base,
      s"graft-test-pid${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(mine)))
    mine.getPath
  }
}
