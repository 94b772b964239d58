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
    dir.getAbsolutePath
  }
}
