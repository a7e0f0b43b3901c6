package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-file metadata recorded in the commit log. min/max are stored as
  * strings with the column's Spark dataType kept in table metadata;
  * [[StatsPruner]] does typed comparison at planning time. Mirrors the
  * per-file stats the reference's Delta log keeps
  * (data/db/delta_dimGeography/_delta_log/00000000000000000000.json:3). */
case class DataFileMeta(
    path: String,            // relative to table root
    partition: String,       // encoded partition value ("" if unpartitioned)
    bucket: Int,
    delta: Boolean,          // MOR log file vs base file
    rows: Long,
    bytes: Long,
    minKey: String,
    maxKey: String,
    stats: Map[String, ColStat] = Map.empty)

case class ColStat(min: String, max: String, nullCount: Long)

/** One timeline entry. `action` ∈ commit|replace|compact|cluster|clean.
  * `removed` lists file paths made obsolete by this commit. A "replace"
  * additionally carries `replacedPartitions` when whole partitions were
  * overwritten/dropped. Mirrors the reference's `.hoodie/` instants
  * (hudi-spark-minio-trino/README.md:252). */
case class Commit(
    instant: String,
    action: String,
    operation: String,
    added: Seq[DataFileMeta] = Nil,
    removed: Seq[String] = Nil,
    replacedPartitions: Seq[String] = Nil,
    schemaJson: String = "",
    extra: Map[String, String] = Map.empty)

object CommitLog {
  val Dir = ".graft"
  val ArchiveFile = "archive.jsonl"

  /** Process-wide instant high-water mark (see nextInstant). */
  private val lastIssued = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
}

/** The table timeline: an append-only directory of JSON commit files.
  *
  * Commit protocol (single filesystem): serialize to `.tmp-*`, then
  * atomic-rename to `<instant>.json`. A commit is visible iff the rename
  * completed — the "commit file signals success" semantics of the
  * reference (README.md:252). On S3 the rename becomes a
  * conditional PUT (if-none-match); flagged in docs, not needed locally.
  *
  * Scale note: the log is the ONLY thing the driver ever lists — file
  * listings for scans come from commit contents, never from walking the
  * data tree (100 TB rule: no O(files) object-store LIST per query).
  */
final class CommitLog(tableRoot: String) {
  import CommitLog._

  private val dir: Path = Paths.get(tableRoot, Dir)

  def init(): Unit = Files.createDirectories(dir)

  /** All commits, instant-ascending, archived ones included. */
  def commits(): Seq[Commit] = {
    val live =
      if (!Files.exists(dir)) Nil
      else Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.matches("\\d+\\.json"))
        .map(p => mapper.readValue(Files.readAllBytes(p), classOf[Commit]))
        .toSeq
    (archived() ++ live).sortBy(_.instant)
  }

  def archived(): Seq[Commit] = {
    val af = dir.resolve(ArchiveFile)
    if (!Files.exists(af)) Nil
    else Files.readAllLines(af).asScala.toSeq.filter(_.nonEmpty)
      .map(mapper.readValue(_, classOf[Commit]))
  }

  def lastInstant(): Option[String] = commits().lastOption.map(_.instant)

  /** Monotonically increasing, zero-padded numeric instant. A
    * process-wide issued-instant high-water mark guarantees two
    * in-process writers never plan the same instant (same-instant
    * plans shared staging/data paths — a real lost-update bug caught
    * by the concurrent-writer test). Cross-process collisions fall
    * back to the tryCommit rename race + UUID-suffixed data files. */
  def nextInstant(): String = {
    val prev = lastInstant().map(_.toLong).getOrElse(0L)
    val candidate = math.max(System.currentTimeMillis() * 1000, prev + 1)
    val issued = CommitLog.lastIssued.updateAndGet(
      last => math.max(candidate, last + 1))
    f"$issued%019d"
  }

  /** Table-level mutex via exclusive lock-file creation — the
    * FileSystemBasedLockProvider analog of the reference's multi-writer
    * configs (multi-writer-1.properties:39 lazy failed-write cleaning +
    * lock provider). On S3 this becomes a conditional PUT / DynamoDB
    * lock; the commit protocol around it is unchanged. */
  def withLock[T](f: => T): T = {
    init()
    val lock = dir.resolve("LOCK")
    var tries = 0
    while (true) {
      try {
        Files.createFile(lock)
        try return f
        finally Files.deleteIfExists(lock)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          tries += 1
          if (tries > 1200) throw new IllegalStateException(
            s"commit lock timeout on $lock")
          Thread.sleep(25)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Atomically publish a commit. Returns false if the instant already
    * exists (concurrent writer won the rename) — caller retries with a
    * fresh instant. */
  def tryCommit(c: Commit): Boolean = {
    init()
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, mapper.writeValueAsBytes(c))
    val target = dir.resolve(s"${c.instant}.json")
    if (Files.exists(target)) { Files.delete(tmp); return false }
    try {
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** Move commits strictly before `keepFrom` into the archive file
    * (timeline stays complete; the hot dir stays small). */
  def archiveBefore(keepFrom: String): Int = {
    val toArchive = Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.matches("\\d+\\.json"))
      .filter(_.getFileName.toString.stripSuffix(".json") < keepFrom)
      .toSeq.sortBy(_.getFileName.toString)
    if (toArchive.isEmpty) return 0
    val af = dir.resolve(ArchiveFile)
    val lines = toArchive.map(p => new String(Files.readAllBytes(p), "UTF-8").replaceAll("\n", " "))
    Files.write(af, (lines.mkString("", "\n", "\n")).getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    toArchive.foreach(Files.delete)
    toArchive.size
  }

  /** Live files as of `asOf` (inclusive; None = latest): fold the
    * timeline, applying adds and removes in instant order. */
  def liveFiles(asOf: Option[String] = None): Seq[DataFileMeta] = {
    val upTo = commits().filter(c => asOf.forall(c.instant <= _))
    val files = scala.collection.mutable.LinkedHashMap[String, DataFileMeta]()
    upTo.foreach { c =>
      c.removed.foreach(files.remove)
      c.added.foreach(f => files(f.path) = f)
    }
    files.values.toSeq
  }

  /** Latest table schema as recorded by the newest commit carrying one. */
  def latestSchemaJson(asOf: Option[String] = None): Option[String] =
    commits().filter(c => asOf.forall(c.instant <= _))
      .reverseIterator.map(_.schemaJson).find(_.nonEmpty)
}
