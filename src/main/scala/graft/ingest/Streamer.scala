package graft.ingest

import graft.core.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Batch-incremental ingestion service — the Hudi Streamer analog
  * (SURVEY.md §3.1; reference: spark-submit HoodieStreamer,
  * hudi-spark-minio-trino/README.md:217-243).
  *
  * Each `runOnce` is one micro-batch: source reads rows *after its
  * checkpoint*, the batch upserts into the target table, and the
  * checkpoint advances atomically only after the commit lands —
  * re-running a failed batch re-upserts the same rows, which is
  * idempotent under keyed latest-wins (the reference's
  * "commit file signals success" exactly-once story, README.md:252).
  */
object Streamer {

  /** One micro-batch: returns the commit instant if rows were
    * ingested. `transform` is the Streamer transformer hook (the
    * SqlQueryBasedTransformer analog — the reference's source→target
    * derived-column evolution, e.g. haversine_distance,
    * test-suite/target.avsc vs source.avsc). */
  def runOnce(table: GraftTable, source: Source,
      transform: DataFrame => DataFrame = identity,
      inlineCompactEvery: Int = 0): Option[String] = {
    val (df, ckpt) = source.next()
    df match {
      case Some(batch) =>
        val instant = table.upsert(transform(batch))
        source.commitCheckpoint(ckpt)
        // inline compaction (hoodie.compact.inline analog): a
        // metadata-only delta-commit count decides; fires at most
        // every `inlineCompactEvery` delta commits
        if (inlineCompactEvery > 0)
          graft.core.TableServices.compactInline(table, inlineCompactEvery)
        Some(instant)
      case None => None
    }
  }

  /** Drain the source: loop runOnce until it reports no new data
    * (the `--continuous` mode loop, bounded for tests). */
  def runUntilCaughtUp(table: GraftTable, source: Source,
      maxBatches: Int = 1000,
      transform: DataFrame => DataFrame = identity,
      inlineCompactEvery: Int = 0): Seq[String] = {
    var out = List.empty[String]
    var i = 0
    var more = true
    while (more && i < maxBatches) {
      runOnce(table, source, transform, inlineCompactEvery) match {
        case Some(c) => out ::= c
        case None => more = false
      }
      i += 1
    }
    out.reverse
  }

  /** Structured Streaming path: attach any streaming DataFrame to a
    * graft table via foreachBatch upsert (SURVEY.md §2.9 — watermarks/
    * windows compose upstream of the sink; keyed dedup happens in the
    * upsert, so no watermark is needed for latest-wins). */
  def streamInto(table: GraftTable, stream: DataFrame,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { table.upsert(batch); () }
      }
      .start()

  /** Streaming CDC apply: a stream of parsed Debezium envelopes
    * (before/after/op/ts_ms — from [[KafkaStream.decodeDebeziumValue]],
    * [[Debezium.parseAvro]], or a file stream under
    * [[Debezium.envelopeSchema]]) applied per micro-batch with the full
    * upsert/stale-tombstone semantics of [[Debezium.apply]]. This is
    * the Kafka → Debezium → table path as one running query. */
  def streamCdcInto(table: GraftTable, envelopes: DataFrame,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { Debezium.apply(table, batch); () }
      }
      .start()
}

/** A checkpointable micro-batch source. `next()` returns the new batch
  * (None if caught up) plus an opaque checkpoint token that becomes
  * durable only after the downstream commit succeeds. */
trait Source {
  def next(): (Option[DataFrame], String)
  def commitCheckpoint(token: String): Unit
}

/** Incremental directory source — the DFS path-selector analog
  * (reference dfs-source.properties:28-29, DFSTestSuitePathSelector):
  * each batch = files that appeared since the checkpoint, ordered by
  * (mtime, name). Driver lists one directory — O(files in dir), kept
  * out of the data path; at 100 TB the listing would shard by prefix. */
abstract class DirSource(spark: SparkSession, dir: String,
    checkpointFile: String) extends Source {

  protected def readFiles(paths: Seq[String]): DataFrame

  private def processed(): Set[String] = {
    val p = Paths.get(checkpointFile)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala.filter(_.nonEmpty).toSet
  }

  override def next(): (Option[DataFrame], String) = {
    val done = processed()
    // Fs.list closes the directory stream (a bare Files.list leaks one
    // fd per poll — fatal for a caught-up loop that rarely GCs); the
    // mtime stat is fetched in the SAME pass. A stat failure must be
    // split two ways: file genuinely gone (deleted between listing and
    // stat) → drop; file still present but the stat was flaky → keep
    // it listed with NO mtime, so its checkpoint entry survives (a
    // drop would erase the processed marker and re-ingest it — dup
    // rows from one transient IOException) but it is not ingested this
    // poll (an unreadable stat is a poor omen for a readable ingest;
    // next poll retries).
    val listed = graft.util.Fs.list(Paths.get(dir))(_
      .filter(Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith("."))
      .flatMap { p =>
        try Some((p.toString, Some(Files.getLastModifiedTime(p).toMillis)))
        catch {
          case _: java.io.IOException =>
            if (Files.exists(p)) Some((p.toString, None)) else None
        }
      }.toSeq)
    val all = listed.map(_._1)
    val fresh = listed.collect { case (p, Some(m)) if !done.contains(p) =>
      (p, m)
    }.sortBy { case (p, m) => (m, p) }.map(_._1)
    if (fresh.isEmpty) (None, "")
    else {
      // the checkpoint keeps only paths STILL PRESENT in the listing:
      // entries for deleted files are dead weight (a re-created
      // same-name file is new data and should re-ingest), and an
      // ever-growing set would make every poll pay O(total history)
      // in checkpoint read+rewrite
      val token = (all.toSet.intersect(done) ++ fresh).toSeq.sorted
        .mkString("\n")
      (Some(readFiles(fresh)), token)
    }
  }

  override def commitCheckpoint(token: String): Unit = {
    val p = Paths.get(checkpointFile)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, token)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

/** JSON-lines directory source with a declared schema — the
  * JsonKafkaSource + FilebasedSchemaProvider analog (S1; reference
  * kafka-source.properties:22-28: schema file + earliest offset). */
class JsonDirSource(spark: SparkSession, dir: String, schema: StructType,
    checkpointFile: String) extends DirSource(spark, dir, checkpointFile) {
  override protected def readFiles(paths: Seq[String]): DataFrame =
    spark.read.schema(schema).json(paths: _*)
}

/** CSV directory source (S4; reference notebook/demo.ipynb cell 8:
  * header=true + inferred or declared schema). */
class CsvDirSource(spark: SparkSession, dir: String,
    checkpointFile: String, schema: Option[StructType] = None)
    extends DirSource(spark, dir, checkpointFile) {
  override protected def readFiles(paths: Seq[String]): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(paths: _*)
  }
}

/** ORC directory source (S4+; same incremental path-selector contract
  * as CSV/JSON — ORC is the second columnar interchange format the
  * Spark-native reader handles with zero extra dependencies). */
class OrcDirSource(spark: SparkSession, dir: String,
    checkpointFile: String, schema: Option[StructType] = None)
    extends DirSource(spark, dir, checkpointFile) {
  override protected def readFiles(paths: Seq[String]): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).orc(paths: _*)
}

/** Parquet directory source (S2 with the native columnar format —
  * the parquet-dfs-source path): same incremental path-selector
  * contract as CSV/JSON/ORC. */
class ParquetDirSource(spark: SparkSession, dir: String,
    checkpointFile: String, schema: Option[StructType] = None)
    extends DirSource(spark, dir, checkpointFile) {
  override protected def readFiles(paths: Seq[String]): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).parquet(paths: _*)
}

/** Chained-table incremental source (S3; reference
  * hoodie-incr.properties:25-27): reads another graft table's changes
  * since the checkpointed commit instant. */
class TableIncrementalSource(upstream: GraftTable, checkpointFile: String)
    extends Source {
  private def last(): String = {
    val p = Paths.get(checkpointFile)
    if (Files.exists(p)) Files.readString(p).trim else "0"
  }

  override def next(): (Option[DataFrame], String) = {
    val from = last()
    // only ROW commits (action commit|replace — readIncremental's own
    // filter) carry ingestable changes: an upstream table SERVICE
    // (compact/cluster/clean) advances the timeline without new rows,
    // and treating its instant as data would publish a spurious empty
    // commit on the chained target (and tick its inline-compaction
    // counter). Service-only advancement returns None and is cheaply
    // re-examined next poll — O(commits) metadata, no data read.
    val rowCommits = upstream.log.commits()
      .filter(c => c.instant > from)
      .filter(c => c.action == "commit" || c.action == "replace")
    rowCommits.lastOption.map(_.instant) match {
      case None => (None, "")
      case Some(latest) =>
        // bound the read to exactly the commits the token covers: a
        // row commit landing between this log read and the snapshot
        // inside readIncremental would otherwise be delivered NOW but
        // not covered by `latest` — and redelivered next poll (the
        // IncrementalMv.sync TOCTOU, same fix: maxCommits)
        (Some(upstream.readIncremental(fromExclusive = from,
          maxCommits = rowCommits.size)), latest)
    }
  }

  override def commitCheckpoint(token: String): Unit = {
    // atomic like DirSource's checkpoint: an in-place truncate+write
    // interrupted by a crash leaves an empty instant and the next run
    // silently re-ingests from scratch
    val p = Paths.get(checkpointFile)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, token)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
