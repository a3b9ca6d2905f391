package graft

import java.nio.file.{Files, Path, Paths}

/** Tracked temp directories for graded queries and the day replay.
  *
  * Several graded entries materialize a small warehouse under a temp
  * dir (streaming twins' source/sink hops, the delete+insert
  * incremental model, the two-day replay). Bare
  * `Files.createTempDirectory` leaked those across repeated Bench /
  * Verify passes (r9 advice): every invocation left a full event-table
  * copy in /tmp with nothing reclaiming it. All such sites now come
  * through [[create]], which registers the dir for recursive deletion
  * in ONE JVM shutdown hook — bounded disk during a run (passes ×
  * small tables), zero residue after it. [[delete]] reclaims eagerly
  * when a caller replaces a dir mid-run (the bench fresh-replay path).
  */
object TempDirs {

  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = created.poll()
      while (p != null) {
        // one unreadable / concurrently-removed dir must not abort
        // cleanup of everything still queued behind it
        try deleteRecursively(p) catch { case _: Throwable => () }
        p = created.poll()
      }
    }, "graft-tempdir-cleanup"))
    true
  }

  /** Create a temp directory registered for recursive deletion at JVM
    * exit; returns its absolute path as a String (the shape every
    * call site wants for parquet path concatenation).
    */
  def create(prefix: String): String = {
    require(hookInstalled)
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Eagerly delete a directory previously returned by [[create]]
    * (idempotent; missing paths are fine).
    */
  def delete(dir: String): Unit = {
    val p = Paths.get(dir)
    created.remove(p)
    deleteRecursively(p)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(c => deleteRecursively(c)) finally s.close()
      }
      try Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
    }
  }
}
