package graft.operators

/** Per-JVM persisted-snapshot cache — the shared mechanism behind
  * `llm_ann_probe`'s index snapshot and `llm_link_incr`'s link index:
  * a deterministic artifact is built ONCE per cache key into a fresh
  * temp directory, parquet round-tripped by the caller, and deleted
  * at JVM exit. Keys embed an input fingerprint (see
  * `Tables.inputFingerprint`) so replaced data invalidates instead of
  * serving stale results. A failed build deletes its half-written
  * directory immediately and rethrows — nothing leaks and nothing is
  * cached, so the next call retries the build. */
private[graft] object Snapshots {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def rmTree(d: String): Unit =
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(d)).deleteRecursively(); ()
    } catch { case _: Throwable => }

  private lazy val cleaner: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.values.forEach(rmTree(_))))
    ()
  }

  /** Directory for `key`, building via `build(tmpDir)` on first use. */
  def of(key: String, prefix: String)(build: String => Unit): String = {
    cleaner
    dirs.computeIfAbsent(key, _ => {
      val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
      try build(tmp)
      catch { case t: Throwable => rmTree(tmp); throw t }
      tmp
    })
  }
}
