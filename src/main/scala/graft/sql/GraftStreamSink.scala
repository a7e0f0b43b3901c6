package graft.sql

import graft.core.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path, Paths}
import scala.util.control.NonFatal

/** Graft table as a Structured Streaming SINK — the DSv2
  * `STREAMING_WRITE` twin of [[GraftMicroBatchStream]], replacing the
  * `foreachBatch` shim ([[graft.ingest.Streamer.streamInto]]) as the
  * symmetric `writeStream.format("graft-stream")` path. Completes the
  * reference's round-trip contract: a graft table can be both the
  * source and the sink of one streaming ETL query
  * (hudi-spark-minio-trino/README.md:211-215 — the deltastreamer
  * continuous-mode table-to-table shape).
  *
  * Exactly-once protocol (per-epoch atomic commit):
  *  1. executors stage each task's rows as plain parquet under
  *     `<root>/.streaming-staging/<queryId>/<epochId>/` — data files
  *     only, invisible to readers (the commit log is the only file
  *     authority);
  *  2. the driver's `commit(epochId)` re-reads ONLY the staged batch
  *     (O(batch), never the table) and runs the engine's normal
  *     keyed-upsert commit — stats-pruned COW merge or MOR delta
  *     append — stamping `(queryId, epochId)` into the commit's
  *     `extra` map;
  *  3. idempotence: a retried epoch (failure after the table commit
  *     but before Spark's own checkpoint advanced) finds its
  *     `(queryId, epoch >= epochId)` stamp on the timeline and skips —
  *     the table state AND the timeline stay exactly-once, so
  *     downstream incremental readers never see a replayed batch.
  *
  * At scale the extra staging materialization is one write+read of the
  * BATCH (not the corpus) per epoch — the cost every file-staging
  * streaming sink pays for executor-side durability; the table-side
  * merge work is identical to the batch upsert path.
  */
final class GraftStreamingWrite(root: String, queryId: String,
    writeSchema: StructType, mergeMode: String = "upsert")
    extends StreamingWrite {

  require(mergeMode == "upsert" || mergeMode == "partial",
    s"unsupported mergeMode '$mergeMode': use upsert | partial")

  import GraftStreamingWrite._

  private def stagingDir(epochId: Long): Path =
    Paths.get(root, StagingDir, queryId, epochId.toString)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    // prepareWrite binds the parquet codec/schema/rebase confs into the
    // job conf on the driver; the factory + conf ship to executors —
    // the same contract Spark's own FileStreamSink relies on
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, writeSchema)
    GraftStreamingDataWriterFactory(owf,
      new SerializableHadoopConf(job.getConfiguration), writeSchema,
      Paths.get(root, StagingDir, queryId).toString)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val table = GraftTable.load(spark, root)
    val done = table.log.commits().exists(c =>
      c.extra.get(QueryIdKey).contains(queryId) &&
        c.extra.get(EpochKey).exists(_.toLong >= epochId))
    val staged = messages.collect { case GraftStagedFiles(ps) => ps }.flatten
    if (!done && staged.nonEmpty) {
      val batch = spark.read.schema(writeSchema).parquet(staged.toSeq: _*)
      val stamp = Map(QueryIdKey -> queryId, EpochKey -> epochId.toString)
      // mergeMode=partial: the Hudi PartialUpdateAvroPayload write
      // option on the streaming path — incoming NULL data columns keep
      // the stored value (CDC feeds that send only changed fields)
      if (mergeMode == "partial") table.upsertPartial(batch, stamp)
      else table.upsert(batch, stamp)
      ()
    }
    deleteRecursively(stagingDir(epochId))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    deleteRecursively(stagingDir(epochId))
}

object GraftStreamingWrite {
  val StagingDir = ".streaming-staging"
  val QueryIdKey = "graft.stream.queryId"
  val EpochKey = "graft.stream.epoch"

  // delegate to the shared helper: it CLOSES the walk stream (a bare
  // Files.walk leaks one fd per epoch commit/abort on a long-running
  // query) and swallows IOException as best-effort — staging cleanup
  // must never fail commit(epochId) AFTER the table commit landed
  private[sql] def deleteRecursively(p: Path): Unit =
    graft.util.TempDirs.deleteRecursively(p)
}

/** One staged parquet file per non-empty task. */
final case class GraftStagedFiles(paths: Seq[String])
    extends WriterCommitMessage

/** Hadoop Configuration is not Serializable; carry it via its own
  * write/readFields wire format (what Spark's private
  * SerializableConfiguration does). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

final case class GraftStreamingDataWriterFactory(owf: OutputWriterFactory,
    conf: SerializableHadoopConf, schema: StructType, queryStagingDir: String)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStagingDataWriter(owf, conf.value, schema,
      Paths.get(queryStagingDir, epochId.toString), partitionId, taskId)
}

/** Stages one task's rows as a single parquet file; the file becomes
  * real data only when the driver's epoch commit folds it into the
  * table. The writer opens lazily so empty tasks stage nothing. */
final class GraftStagingDataWriter(owf: OutputWriterFactory,
    conf: Configuration, schema: StructType, epochDir: Path,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val path =
    epochDir.resolve(s"part-$partitionId-$taskId.parquet").toString
  private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _

  private def open(): Unit = if (writer == null) {
    Files.createDirectories(epochDir)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-stream", 0), TaskType.MAP, partitionId), 0)
    writer = owf.newInstance(path, schema,
      new TaskAttemptContextImpl(new Configuration(conf), attempt))
  }

  override def write(record: InternalRow): Unit = {
    open()
    writer.write(record)
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) GraftStagedFiles(Nil)
    else { writer.close(); writer = null; GraftStagedFiles(Seq(path)) }

  override def abort(): Unit = close()

  override def close(): Unit = if (writer != null) {
    try writer.close() catch { case NonFatal(_) => () }
    writer = null
    Files.deleteIfExists(Paths.get(path))
    ()
  }
}
