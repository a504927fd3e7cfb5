package graft

import org.scalatest.funsuite.AnyFunSuite

/** Safety properties of the scratch reaper (ADVICE r8): it must only
  * delete graft-named entries whose creating PID is dead or recycled,
  * must never follow a directory symlink out of scratch, and the base
  * must be namespaced under a graft-owned subdir on every branch. */
class ScratchSpec extends AnyFunSuite {
  private def mkSandbox(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("scratch_spec").toFile
    d.deleteOnExit()
    d
  }

  test("reap deletes dead-PID entries and keeps live-PID entries") {
    val sb = mkSandbox()
    // PID 1 exists on any Linux box (init) and started at boot — long
    // before this entry's mtime, so it reads as a LIVE creator
    val live = new java.io.File(sb, "spark_local_1_abcd1234")
    // a PID far above pid_max never exists -> dead
    val dead = new java.io.File(sb, "ckpt_99999999_beef0000")
    assert(live.mkdirs() && dead.mkdirs())
    assert(new java.io.File(dead, "delta").createNewFile())
    Scratch.reap(sb)
    assert(live.isDirectory, "live-PID entry must survive")
    assert(!dead.exists(), "dead-PID entry must be reaped")
  }

  test("reap deletes recycled-PID entries (proc younger than entry)") {
    val sb = mkSandbox()
    // this test JVM's own PID is live, but we backdate the entry to long
    // before the JVM started: the reaper must read it as a recycled PID
    val pid = ProcessHandle.current().pid()
    val e = new java.io.File(sb, s"spark_local_${pid}_cafe0001")
    assert(e.mkdirs())
    assert(e.setLastModified(System.currentTimeMillis() - 30L * 24 * 3600 * 1000))
    Scratch.reap(sb)
    assert(!e.exists(), "entry older than its PID's process must be reaped")
  }

  test("reap ignores entries that do not match graft's naming scheme") {
    val sb = mkSandbox()
    val foreign1 = new java.io.File(sb, "somefile.txt")
    val foreign2 = new java.io.File(sb, "no-pid-here")
    assert(foreign1.createNewFile() && foreign2.mkdirs())
    Scratch.reap(sb)
    assert(foreign1.exists() && foreign2.exists(),
      "non-graft-named entries must never be touched")
  }

  test("reap does not recurse through a symlink out of the entry") {
    val sb = mkSandbox()
    val outside = mkSandbox()
    val precious = new java.io.File(outside, "precious.txt")
    assert(precious.createNewFile())
    val dead = new java.io.File(sb, "ckpt_99999999_feed0002")
    assert(dead.mkdirs())
    java.nio.file.Files.createSymbolicLink(
      new java.io.File(dead, "escape").toPath, outside.toPath)
    Scratch.reap(sb)
    assert(!dead.exists(), "the entry itself is reaped")
    assert(precious.exists(),
      "files behind a symlink must survive — only the link is deleted")
  }

  test("base is namespaced under a graft-owned subdir") {
    // whatever branch resolved (env/shm/tmpdir), the base must end in
    // the graft-owned component so reaping never scans a shared dir
    assert(Scratch.base.endsWith("graft_scratch"))
  }

  test("delete refuses paths outside the base") {
    val sibling = new java.io.File(Scratch.base + "2_outside")
    sibling.mkdirs()
    try {
      Scratch.delete(sibling.getAbsolutePath)
      assert(sibling.exists(), "a sibling of base must not be deletable")
      Scratch.delete(Scratch.base)
      assert(new java.io.File(Scratch.base).exists(),
        "the base itself must not be deletable")
    } finally { sibling.delete(): Unit }
  }
}
