package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Closed-stream filesystem listings. `Files.list`/`Files.walk` return
  * streams holding an open directory fd until closed — leaking one per
  * call until GC. These helpers close deterministically; use them for
  * anything on a hot path (every commit/read lists the timeline). */
object Fs {

  def list[A](d: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(d)
    try f(s.iterator().asScala) finally s.close()
  }

  def walk[A](d: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(d)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Materialized variants for the common list-then-iterate shape. */
  def listSeq(d: Path): Seq[Path] = list(d)(_.toSeq)
  def walkSeq(d: Path): Seq[Path] = walk(d)(_.toSeq)

  /** Recursive file copy (src dir → dst dir, created as needed).
    * Existing files at the destination are replaced. */
  def copyRecursively(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    walk(src)(_.filter(Files.isRegularFile(_)).foreach { p =>
      val target = dst.resolve(src.relativize(p))
      Files.createDirectories(target.getParent)
      Files.copy(p, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    })
  }
}
