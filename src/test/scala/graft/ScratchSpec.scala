package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Scratch

class ScratchSpec extends AnyFunSuite {

  test("cleanupOrphans reaps dead-pid dirs and legacy shared-layout dirs, keeps live ones") {
    val root = new java.io.File(Scratch.root)
    root.mkdirs()
    // a dir owned by THIS (live) process must survive
    val live = new java.io.File(root, s"p${ProcessHandle.current().pid()}-spec")
    live.mkdirs()
    new java.io.File(live, "keep.bin").createNewFile()
    // a dir owned by a pid that cannot exist (pid_max is < 2^22 + margin)
    val dead = new java.io.File(root, "p999999999-spec")
    dead.mkdirs()
    new java.io.File(dead, "leak.bin").createNewFile()
    // legacy shared-layout names are orphans only once STALE (mtime
    // gate: a live older-checkout JVM's shuffle scratch must survive)
    val legacy = new java.io.File(root, "blockmgr-deadbeef-spec")
    legacy.mkdirs()
    legacy.setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L): Unit
    val legacyFresh = new java.io.File(root, "blockmgr-fresh-spec")
    legacyFresh.mkdirs()
    // unrecognized names must be left alone
    val foreign = new java.io.File(root, "something-else")
    foreign.mkdirs()
    try {
      Scratch.cleanupOrphans(): Unit
      assert(live.exists(), "live-pid dir was reaped")
      assert(!dead.exists(), "dead-pid dir survived")
      assert(!legacy.exists(), "stale legacy blockmgr dir survived")
      assert(legacyFresh.exists(), "fresh legacy blockmgr dir was reaped")
      assert(foreign.exists(), "unrecognized dir was reaped")
    } finally {
      Seq(live, dead, legacy, legacyFresh, foreign).foreach(Scratch.deleteRecursively)
    }
  }

  test("legacy staleness is judged by the newest NESTED mtime, not the top dir") {
    // Shuffle blocks land two levels down (bucket subdir, then block
    // file) without touching the root dir's mtime — a live
    // older-checkout JVM's scratch looks frozen at the top while its
    // leaves churn, and must survive the sweep.
    val root = new java.io.File(Scratch.root)
    root.mkdirs()
    val legacyLive = new java.io.File(root, "blockmgr-nested-spec")
    val bucket = new java.io.File(legacyLive, "0a")
    bucket.mkdirs()
    new java.io.File(bucket, "shuffle_0_0_0.data").createNewFile()
    val old = System.currentTimeMillis() - 11 * 60 * 1000L
    legacyLive.setLastModified(old): Unit
    bucket.setLastModified(old): Unit // only the leaf file is fresh
    try {
      Scratch.cleanupOrphans(): Unit
      assert(legacyLive.exists(),
        "legacy dir with a fresh nested write was reaped")
    } finally Scratch.deleteRecursively(legacyLive)
  }

  test("localDir creates a per-pid dir under the root") {
    val d = new java.io.File(Scratch.localDir("spec2"))
    assert(d.exists() && d.isDirectory)
    assert(d.getName == s"p${ProcessHandle.current().pid()}-spec2")
    assert(d.getParentFile.getAbsolutePath == new java.io.File(Scratch.root).getAbsolutePath)
    Scratch.deleteRecursively(d)
  }
}
