package graft

/** Scratch storage for shuffle spill and streaming checkpoints.
  *
  * On a production cluster `spark.local.dir` is provisioned NVMe (one
  * mount per disk) and streaming checkpoints live on the cluster FS —
  * neither competes with the OS volume. On this single-VM harness the JVM
  * default tmpdir is `/tmp` on the one virtio root disk, so every shuffle
  * spill and state-store commit generates iowait against the same device
  * the OS and the testdata reads use. The 50M-node rehearsal measured
  * exactly that: the shuffle-heavy graph family's own /tmp spills tripped
  * the bench's first (steal+iowait) contention criterion on an otherwise
  * idle box (ROUND8.md). RAM is the faster disk we actually have —
  * `/dev/shm` is a 126 GiB tmpfs against ≤ a few GiB of sf0.1 spill.
  *
  * Policy: `SPARK_GRAFT_SCRATCH` env overrides; else `/dev/shm` when it
  * exists and is writable; else the JVM tmpdir. Bench/Verify point
  * `spark.local.dir` here and the streaming replay harness keeps its
  * per-query checkpoints here (deleted in `finally` — a leaked tmpfs
  * checkpoint would be leaked RAM, unlike a leaked /tmp file).
  * The SCALE REHEARSALS deliberately do NOT use this: at 50M nodes the
  * spill volume is a real fraction of RAM and tmpfs spill would compete
  * with the 48g heap — a production-shaped disk spill is the honest cost
  * there.
  */
object Scratch {
  /** Resolved scratch base directory (created on first use). */
  lazy val base: String = {
    val pick = sys.env.get("SPARK_GRAFT_SCRATCH").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft_scratch")
      else None
    }.getOrElse(sys.props("java.io.tmpdir"))
    val f = new java.io.File(pick)
    f.mkdirs()
    f.getAbsolutePath
  }

  /** A fresh subdirectory under [[base]] for one consumer (not created —
    * Spark/streaming creates it). Caller owns deletion. */
  def dir(prefix: String): String =
    s"$base/${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Recursively delete a scratch path (best-effort; tmpfs leak = RAM
    * leak, so streaming callers run this in `finally`). */
  def delete(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    val f = new java.io.File(path)
    // refuse to delete anything outside the scratch base
    if (f.getAbsolutePath.startsWith(base)) rm(f)
  }
}
