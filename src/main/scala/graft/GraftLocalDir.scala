package graft

/** Repo-owned Spark scratch directory.
  *
  * Spark's default local dir is java.io.tmpdir (or whatever the launcher
  * points it at): a SHARED /tmp location an external cleaner may sweep
  * while a run is in flight. Round 4's official bench died exactly that
  * way — blockmgr temp_shuffle files disappeared mid-stage and the
  * executor self-terminated (exit 56). Every graft main/test session
  * instead uses a per-process directory under the build's target/, which
  * nothing else touches; it is deleted on clean JVM exit (Spark already
  * deletes its own blockmgr-* subdirs, this removes the parent too).
  *
  * NOTE: SPARK_LOCAL_DIRS in the environment would still override
  * spark.local.dir (Spark reads the env var first); there is no in-JVM
  * way around that, but the observed failure came from the tmpdir path.
  */
object GraftLocalDir {
  lazy val path: String = {
    // Anchored at the launcher's CWD (sbt runs from the repo root). If that
    // isn't writable — e.g. a harness launching the assembly from elsewhere —
    // fall back to a PER-USER tmpdir subdir rather than failing session
    // construction: a sweepable scratch dir is still better than no session
    // at all, and the user suffix keeps a same-named dir owned by another
    // user from being selected (isDirectory alone would accept it and
    // createTempFile would then fail anyway). Writability is probed with a
    // real file create, not isDirectory — an existing-but-unwritable dir
    // must not win the search.
    def writable(d: java.io.File): Boolean =
      (d.isDirectory || d.mkdirs()) && {
        try {
          val probe = java.io.File.createTempFile("probe-", "", d)
          probe.delete()
          true
        } catch { case _: java.io.IOException => false }
      }
    val user = sys.props.getOrElse("user.name", "anon")
    val base = Seq(new java.io.File("target/spark-local"),
                   new java.io.File(sys.props("java.io.tmpdir"), s"graft-spark-local-$user"))
      .find(writable)
      .getOrElse(new java.io.File(sys.props("java.io.tmpdir")))
    val dir = java.io.File.createTempFile("run-", "", base)
    dir.delete()
    dir.mkdirs()
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
    // Route the other two user.dir droppings into the same owned dir
    // (every session builder evaluates this lazy val before getOrCreate,
    // and SparkConf reads spark.* system properties at construction):
    // Derby's derby.log (written to user.dir at engine boot, before any
    // per-connection setting could apply) and the catalog warehouse
    // (user.dir/spark-warehouse) both landed in the repo root otherwise.
    // getOrElseUpdate so an explicit external setting still wins.
    sys.props.getOrElseUpdate("derby.stream.error.file",
      new java.io.File(dir, "derby.log").getAbsolutePath)
    sys.props.getOrElseUpdate("spark.sql.warehouse.dir",
      new java.io.File(dir, "spark-warehouse").getAbsolutePath)
    dir.getAbsolutePath
  }
}
