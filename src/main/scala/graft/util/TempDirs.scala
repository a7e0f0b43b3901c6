package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Central temp-directory discipline for every graft harness (tests,
  * Bench, Verify, Profile, ad-hoc mains).
  *
  * Two mechanisms, both structural (no per-round manual cleanup):
  *  - [[create]] registers each directory in a single JVM shutdown
  *    hook that deletes it recursively — a normal run exits with zero
  *    `graft-*` residue in `java.io.tmpdir`;
  *  - [[sweepStale]] (invoked from [[graft.Session]] at session build)
  *    reaps `graft-*` directories older than a threshold — the safety
  *    net for crashed/killed JVMs whose hooks never ran. The age gate
  *    keeps it safe under concurrent JVMs: a live run's dirs are young.
  */
object TempDirs {

  private val tracked = new ConcurrentLinkedQueue[Path]()

  @volatile private var hookInstalled = false
  private def ensureHook(): Unit = if (!hookInstalled) synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        tracked.iterator().asScala.foreach(deleteRecursively)))
      hookInstalled = true
    }
  }

  /** Create a temp directory that is deleted at JVM exit. Returns the
    * Path (call sites keep their `.toString`). */
  def create(prefix: String): Path = {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    tracked.add(p)
    p
  }

  /** Register an externally-created directory for shutdown deletion. */
  def track(path: String): String = {
    ensureHook()
    tracked.add(Paths.get(path))
    path
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      catch { case _: java.io.IOException => () } // best effort
      finally s.close()
    }

  /** Delete `graft-*` dirs in `java.io.tmpdir` last modified more than
    * `maxAgeMs` ago (default 3 h). Returns how many were removed. */
  def sweepStale(maxAgeMs: Long = 3L * 3600 * 1000): Int = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val stale = {
      val s = Files.list(tmp)
      try s.iterator().asScala.filter { p =>
        Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("graft-") &&
          (try Files.getLastModifiedTime(p).toMillis < cutoff
           catch { case _: java.io.IOException => false })
      }.toList
      finally s.close()
    }
    stale.foreach(deleteRecursively)
    stale.size
  }
}
