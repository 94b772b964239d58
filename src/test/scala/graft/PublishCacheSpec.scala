package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SparkEntry.sweepStalePublishDirs]] — the startup sweep that
  * bounds target/graft-scratch growth across crashed JVMs. The cache's
  * correctness never depended on the sweep (a stale nonce is unreachable
  * by construction); what the sweep must get right is the DELETION
  * boundary: remove dead-pid orphans OF THIS HOST only, never touch this
  * JVM's own dirs, a concurrent live JVM's, or any dir whose host token
  * isn't ours (another host's pid table is invisible here — the
  * shared-filesystem case — so its dirs are never reasoned about).
  */
class PublishCacheSpec extends AnyFunSuite {
  private def mkPub(base: java.nio.file.Path, name: String): java.nio.file.Path = {
    val d = base.resolve(name)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.writeString(d.resolve("part-0.parquet"), "x")
    d
  }

  test("sweep deletes this host's dead-pid orphans; keeps own, live, foreign-host, legacy") {
    val base = java.nio.file.Files.createTempDirectory("graft_pubsweep")
    base.toFile.deleteOnExit()
    val host = SparkEntry.publishHost
    val myPid = ProcessHandle.current().pid()
    val ownNonce = s"${host}_${myPid}_12345"
    // a pid that cannot exist (Linux pid_max caps at 2^22)
    val deadPid = 99999999L
    val own = mkPub(base, s"pub_cc_serve_sf0.01_$ownNonce")
    // concurrent JVM: same live pid, DIFFERENT start time — must survive
    // (the conservative branch: any live pid is left alone)
    val live = mkPub(base, s"pub_cc_serve_sf0.01_${host}_${myPid}_777")
    val orphan = mkPub(base, s"pub_cc_serve_sf0.01_${host}_${deadPid}_888")
    // underscores in the key must not confuse the right-anchored parse
    val orphan2 = mkPub(base, s"pub_dict_match_idx_sf0.1_${host}_${deadPid}_999")
    // ANOTHER host's dead-looking pid: its pid table is not ours to read
    // — must survive even though the pid is dead HERE
    val foreign = mkPub(base, s"pub_cc_serve_sf0.01_otherbox_${deadPid}_888")
    // legacy pre-host-token layout (pid_start only): not ours to reason
    // about — survives until sbt clean
    val legacy = mkPub(base, s"pub_cc_serve_sf0.01_${deadPid}_888")
    // non-pub dirs and unparseable names are never touched
    val other = mkPub(base, "scratch_something")
    val odd = mkPub(base, "pub_weird")
    val deleted = SparkEntry.sweepStalePublishDirs(base, ownNonce).toSet
    assert(deleted == Set(orphan.getFileName.toString,
      orphan2.getFileName.toString))
    assert(!java.nio.file.Files.exists(orphan))
    assert(!java.nio.file.Files.exists(orphan2))
    assert(java.nio.file.Files.exists(own.resolve("part-0.parquet")))
    assert(java.nio.file.Files.exists(live))
    assert(java.nio.file.Files.exists(foreign))
    assert(java.nio.file.Files.exists(legacy))
    assert(java.nio.file.Files.exists(other))
    assert(java.nio.file.Files.exists(odd))
    // idempotent on a clean base
    assert(SparkEntry.sweepStalePublishDirs(base, ownNonce).isEmpty)
  }

  test("sweep on a missing base is a no-op") {
    val ghost = java.nio.file.Paths.get("target", "graft-no-such-dir")
    assert(SparkEntry.sweepStalePublishDirs(ghost, "n").isEmpty)
  }
}
