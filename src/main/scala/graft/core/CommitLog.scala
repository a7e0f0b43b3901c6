package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Path, Paths}
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

  /** Commit files parsed since process start — test instrumentation for
    * the O(1)-re-reads-per-op property (a commit file is immutable once
    * published, so parse counts directly measure redundant IO). */
  val filesParsed = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Lock considered stale (crashed owner) after this many millis;
    * overridable for tests. */
  private[core] def lockStaleMs: Long =
    sys.props.get("graft.lock.staleMs").map(_.toLong).getOrElse(10 * 60 * 1000L)

  private[graft] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
}

/** An immutable view of the timeline at a point in time. Write
  * operations load ONE snapshot up front and do all planning against it
  * (lastInstant, liveFiles, schema) — a single directory scan per
  * operation instead of one per planning question. */
final class TimelineSnapshot private[core] (val commits: Seq[Commit]) {

  def lastInstant: Option[String] = commits.lastOption.map(_.instant)

  /** Live files as of `asOf` (inclusive; None = snapshot head): fold the
    * timeline, applying adds and removes in instant order. */
  def liveFiles(asOf: Option[String] = None): Seq[DataFileMeta] = {
    val upTo = asOf.fold(commits)(a => commits.filter(_.instant <= a))
    val files = scala.collection.mutable.LinkedHashMap[String, DataFileMeta]()
    upTo.foreach { c =>
      c.removed.foreach(files.remove)
      c.added.foreach(f => files(f.path) = f)
    }
    files.values.toSeq
  }

  def latestSchemaJson(asOf: Option[String] = None): Option[String] =
    asOf.fold(commits)(a => commits.filter(_.instant <= a))
      .reverseIterator.map(_.schemaJson).find(_.nonEmpty)
}

/** The table timeline: an append-only directory of JSON commit files.
  *
  * Commit protocol (single filesystem): serialize fully to `.tmp-*`,
  * then PUBLISH VIA HARD LINK — `Files.createLink(target, tmp)` fails
  * atomically with EEXIST if the instant was already committed (POSIX
  * link(2) never replaces), so two processes planning the same instant
  * cannot both "succeed" the way a rename (which silently replaces on
  * POSIX) would allow. A commit is visible iff the link exists, and
  * only ever with complete contents. On S3 this becomes a conditional
  * PUT (if-none-match); flagged in docs, not needed locally.
  *
  * Scale notes:
  *  - the log is the ONLY thing the driver ever lists — file listings
  *    for scans come from commit contents, never from walking the data
  *    tree (100 TB rule: no O(files) object-store LIST per query).
  *  - published commit files are immutable, so parsed commits are
  *    cached per path: a `commits()` call re-lists the directory (one
  *    readdir) but only parses instants it has not seen — O(new), not
  *    O(all), at 100k commits.
  */
final class CommitLog(tableRoot: String) {
  import CommitLog._

  private val dir: Path = Paths.get(tableRoot, Dir)

  // parse caches — safe because commit files and archive lines are
  // immutable once written (archiveBefore only moves, never edits)
  private val parsed = new java.util.concurrent.ConcurrentHashMap[String, Commit]()
  @volatile private var archiveCache: (Long, Seq[Commit]) = (-1L, Nil)

  def init(): Unit = Files.createDirectories(dir)

  private def parseFile(p: Path): Commit = {
    val name = p.getFileName.toString
    val hit = parsed.get(name)
    if (hit != null) hit
    else {
      CommitLog.filesParsed.incrementAndGet()
      val c = mapper.readValue(Files.readAllBytes(p), classOf[Commit])
      parsed.put(name, c)
      c
    }
  }

  /** Closed directory listing: Files.list leaks a directory fd until
    * GC if the stream isn't closed — and this is the hottest metadata
    * path (every snapshot lists the timeline dir). */
  private def listClosed[A](d: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(d)
    try f(s.iterator().asScala) finally s.close()
  }

  /** All commits, instant-ascending, archived ones included. A crash
    * between archiveBefore's append and its source deletion can leave
    * an instant in BOTH places — dedup by instant (the copies are
    * byte-identical), or counting-based retention logic would drift. */
  def commits(): Seq[Commit] = {
    val live =
      if (!Files.exists(dir)) Nil
      else listClosed(dir)(_
        .filter(p => p.getFileName.toString.matches("\\d+\\.json"))
        .map(parseFile)
        .toSeq)
    (archived() ++ live).distinctBy(_.instant).sortBy(_.instant)
  }

  /** One directory scan, all planning questions answered off the result. */
  def snapshot(): TimelineSnapshot = new TimelineSnapshot(commits())

  def archived(): Seq[Commit] = {
    val af = dir.resolve(ArchiveFile)
    if (!Files.exists(af)) Nil
    else {
      val size = Files.size(af)
      val (cachedSize, cached) = archiveCache
      if (cachedSize == size) cached
      else {
        val cs = Files.readAllLines(af).asScala.toSeq.filter(_.nonEmpty)
          .map(mapper.readValue(_, classOf[Commit]))
        archiveCache = (size, cs)
        cs
      }
    }
  }

  def lastInstant(): Option[String] = commits().lastOption.map(_.instant)

  /** Monotonically increasing, zero-padded numeric instant. A
    * process-wide issued-instant high-water mark guarantees two
    * in-process writers never plan the same instant (same-instant
    * plans shared staging/data paths — a real lost-update bug caught
    * by the concurrent-writer test). Cross-process collisions are
    * rejected atomically by the createLink publish in tryCommit. */
  def nextInstant(): String = nextInstantAfter(lastInstant())

  /** Like nextInstant but reuses an already-loaded snapshot head, so
    * planning a write costs one timeline scan total. */
  def nextInstantAfter(last: Option[String]): String = {
    val prev = last.map(_.toLong).getOrElse(0L)
    // sub-millisecond digits carry a pid residue: two PROCESSES
    // planning in the same millisecond draw different instants, so
    // cross-process instant collisions (which would force a write to
    // replan — rows are stamped with the planned instant) need a
    // pid-residue collision in the same millisecond first. Intra-process
    // uniqueness is the lastIssued high-water, as before.
    val pidSalt = java.lang.ProcessHandle.current().pid() % 1000L
    val candidate = math.max(
      System.currentTimeMillis() * 1000 + pidSalt, prev + 1)
    val issued = CommitLog.lastIssued.updateAndGet(
      l => math.max(candidate, l + 1))
    f"$issued%019d"
  }

  /** Table-level mutex via exclusive lock-file creation — the
    * FileSystemBasedLockProvider analog of the reference's multi-writer
    * configs (multi-writer-1.properties:39 lazy failed-write cleaning +
    * lock provider). The lock file records owner + acquire time; a lock
    * older than `graft.lock.staleMs` is presumed orphaned by a crashed
    * writer and taken over (the reference's lock providers expire stale
    * locks the same way). On S3 this becomes a conditional PUT /
    * DynamoDB lock; the commit protocol around it is unchanged. */
  def withLock[T](f: => T): T = {
    init()
    val lock = dir.resolve("LOCK")
    val token = java.util.UUID.randomUUID().toString
    var tries = 0
    while (true) {
      try {
        Files.write(lock,
          s"""{"owner":"${java.lang.ProcessHandle.current().pid()}/${Thread.currentThread().getId}","token":"$token","acquiredMs":${System.currentTimeMillis()}}"""
            .getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        try return f
        finally {
          // FENCED release: delete only the lock we wrote. A holder
          // paused past the staleness threshold may have been taken
          // over — deleting blindly would free someone else's lock.
          try {
            if (new String(Files.readAllBytes(lock), "UTF-8").contains(token))
              Files.delete(lock)
          } catch { case _: java.io.IOException => () }
        }
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          reapIfStale(lock)
          tries += 1
          if (tries > 1200) throw new IllegalStateException(
            s"commit lock timeout on $lock — if no writer is alive, delete " +
            s"this file to recover (stale locks auto-expire after ${lockStaleMs / 1000}s)")
          Thread.sleep(25)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Acquire-time millis stamped inside the lock's content at
    * CREATE_NEW; mtime fallback only for unparsable content. Content
    * beats mtime for staleness: a REACQUIRED lock always carries a
    * fresh stamp, so a live holder's lock is never judged stale by a
    * filesystem-timestamp artifact. */
  private def lockAcquiredMs(p: Path): Long = {
    val content = new String(Files.readAllBytes(p), "UTF-8")
    "\"acquiredMs\":(\\d+)".r.findFirstMatchIn(content)
      .map(_.group(1).toLong)
      .getOrElse(Files.getLastModifiedTime(p).toMillis)
  }

  /** Stale-lock takeover with an ATOMIC claim: the candidate is
    * RENAMED to a unique reap name first — rename succeeds for exactly
    * one reaper, so two waiters can never both "delete the stale lock"
    * with one of them actually deleting a fresh lock acquired in
    * between (the naive check-then-delete TOCTOU). Staleness is read
    * from the lock's CONTENT (acquiredMs), so the restore path below is
    * reachable only when a stale holder releases AND a new writer
    * acquires inside the read→rename window. If the rename nonetheless
    * claimed a fresh lock, it is moved straight back — and if THAT
    * restore collides with yet another CREATE_NEW, the mutual-exclusion
    * protocol is violated (displaced holder + new waiter would both
    * proceed); that is fatal for this waiter, never swallowed. */
  private def reapIfStale(lock: Path): Unit =
    try {
      if (System.currentTimeMillis() - lockAcquiredMs(lock) > lockStaleMs) {
        val reaped = lock.resolveSibling(
          s".lock-reaped-${java.util.UUID.randomUUID()}")
        Files.move(lock, reaped)
        val age = System.currentTimeMillis() - lockAcquiredMs(reaped)
        if (age > lockStaleMs) Files.delete(reaped)
        else {
          try Files.move(reaped, lock) // stole a fresh lock — restore it
          catch {
            case e: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(reaped)
              throw new IllegalStateException(
                s"lock takeover raced a fresh acquire on $lock: a live " +
                "holder was displaced and the slot retaken. Aborting this " +
                "waiter; the displaced holder's commit is still fenced by " +
                "OCC validation + EEXIST publish, but mutual exclusion " +
                "cannot be guaranteed for this acquire attempt", e)
          }
        }
      }
    } catch { case _: java.io.IOException => () } // lost the race = freed

  /** Atomically publish a commit. Returns false if the instant already
    * exists (a concurrent writer published it first) — caller retries
    * with a fresh instant. Publish = hard-link creation, which fails
    * with EEXIST rather than replacing, making the duplicate-instant
    * race loss-free across processes. */
  def tryCommit(c: Commit): Boolean = {
    init()
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, mapper.writeValueAsBytes(c))
    val target = dir.resolve(s"${c.instant}.json")
    try {
      Files.createLink(target, tmp)
      parsed.put(target.getFileName.toString, c)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** Move commits strictly before `keepFrom` into the archive file
    * (timeline stays complete; the hot dir stays small). Runs under
    * the table lock — two concurrent archivers would otherwise both
    * append the same commits; and instants already present in the
    * archive (a previous run crashed between append and delete) are
    * never appended twice. */
  def archiveBefore(keepFrom: String): Int = withLock {
    val alreadyArchived = archived().map(_.instant).toSet
    val toArchive = listClosed(dir)(_
      .filter(p => p.getFileName.toString.matches("\\d+\\.json"))
      .filter(_.getFileName.toString.stripSuffix(".json") < keepFrom)
      .toSeq).sortBy(_.getFileName.toString)
    if (toArchive.isEmpty) return 0
    val fresh = toArchive.filterNot(p =>
      alreadyArchived.contains(p.getFileName.toString.stripSuffix(".json")))
    if (fresh.nonEmpty) {
      val af = dir.resolve(ArchiveFile)
      val lines = fresh.map(p =>
        new String(Files.readAllBytes(p), "UTF-8").replaceAll("\n", " "))
      Files.write(af, (lines.mkString("", "\n", "\n")).getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    toArchive.foreach { p =>
      Files.deleteIfExists(p)
      parsed.remove(p.getFileName.toString)
    }
    toArchive.size
  }

  /** Live files as of `asOf` (inclusive; None = latest): fold the
    * timeline, applying adds and removes in instant order. */
  def liveFiles(asOf: Option[String] = None): Seq[DataFileMeta] =
    snapshot().liveFiles(asOf)

  /** Latest table schema as recorded by the newest commit carrying one. */
  def latestSchemaJson(asOf: Option[String] = None): Option[String] =
    snapshot().latestSchemaJson(asOf)
}
