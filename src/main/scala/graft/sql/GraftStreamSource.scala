package graft.sql

import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.streaming.StreamingWrite
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** Graft table as a Structured Streaming SOURCE: `spark.readStream
  * .format(classOf[GraftStreamTableProvider].getName).option("path",
  * root).load()` emits each commit's row changes as micro-batches —
  * the `readStream` twin of [[graft.core.GraftTable.readIncremental]]
  * (Hudi's streaming incremental-read analog; the driver-loop
  * [[graft.ingest.TableIncrementalSource]] stays as the batch-chaining
  * path).
  *
  * Offsets ARE commit instants (sortable strings, checkpointed by
  * Spark) — recovery replays exactly the uncommitted commit range, and
  * exactly-once follows from commit-instant determinism. Each batch
  * plans one [[InputPartition]] per TOUCHED file group (live files as
  * of the range end), and the reader is the [[GraftMorPartitionReader]]
  * merge with the commit-range filter applied after the merge — the
  * same "stale base row loses to its delta before visibility is
  * decided" shape as the batch incremental read, with zero exchanges.
  *
  * Restore/bootstrap commits inside a planned range throw (a streaming
  * cursor cannot see restored/adopted rows — same contract as
  * readIncremental's guards).
  */
class GraftStreamTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def root(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft stream source requires .option(\"path\", <table root>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.load(SparkSession.active, root(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // same case-insensitive lookup + null require as inferSchema — a
    // misconfigured reader gets the actionable message, not an NPE
    new GraftStreamTable(root(new CaseInsensitiveStringMap(properties)), schema)
}

final class GraftStreamTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft_stream($root)"
  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] = {
    val caps = new util.HashSet[TableCapability]()
    caps.add(TableCapability.MICRO_BATCH_READ)
    caps.add(TableCapability.STREAMING_WRITE)
    // upsert may evolve the schema / omit metadata columns, same as
    // every other engine write path — defer checks to prepare/align
    caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      // READ-side only (inferSchema also serves the SINK, which
      // legitimately starts on an empty destination): the inferred
      // schema is pinned for the query's lifetime, so a stream READ
      // begun on a never-written table would capture the empty struct
      // and die on its first planned batch with a bare fieldIndex
      // error — fail at start() with the actionable message instead
      // (the batch scan has the same guard, GraftMorScan)
      require(tableSchema.fields.nonEmpty,
        s"graft table at $root has no commits yet — write a first " +
        "batch before starting a stream over it")
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftMicroBatchStream(SparkSession.active, root, tableSchema)
    }

  /** `writeStream.format("graft-stream")` — per-epoch exactly-once
    * upsert commits (see [[GraftStreamingWrite]]). Writer option
    * `mergeMode` ∈ upsert (default) | partial (null-preserving
    * PartialUpdateAvroPayload semantics). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = {
          val mode = Option(info.options.get("mergeMode")).getOrElse("upsert")
          new GraftStreamingWrite(root, info.queryId(), info.schema(), mode)
        }
      }
    }
}

/** Streaming offset = commit instant (zero-padded sortable string). */
final case class GraftOffset(instant: String) extends Offset {
  override def json: String = instant
}

final class GraftMicroBatchStream(spark: SparkSession, root: String,
    tableSchema: StructType) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  // reload per call: the commit log is the source of truth and other
  // writers append to it while the stream runs
  private def table: GraftTable = GraftTable.load(spark, root)

  // Same delta-volume guards (and the same confs) as the batch
  // GraftMorScan: a neglected table the batch scan rejects with
  // "compact first" must not stream into an executor-heap OOM either.
  private def confLong(key: String, dflt: Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)
  private def maxDeltaBytes: Long =
    confLong("spark.graft.mor.maxDeltaBytesPerGroup", 2L << 30)
  private def maxDeltaRows: Long =
    confLong("spark.graft.mor.maxDeltaRowsPerGroup", 20L * 1000 * 1000)

  override def initialOffset(): Offset = GraftOffset("0")
  override def deserializeOffset(json: String): Offset = GraftOffset(json)
  override def latestOffset(): Offset =
    GraftOffset(table.log.lastInstant().getOrElse("0"))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // ---- admission control + Trigger.AvailableNow ---------------------
  // `spark.graft.stream.maxCommitsPerTrigger` bounds how many table
  // commits one micro-batch may span (the deltastreamer `max.commits` /
  // Kafka `maxOffsetsPerTrigger` analog): a stream starting against a
  // long backlog catches up in bounded batches instead of planning the
  // whole history as one giant batch. AvailableNow pins the end of the
  // run to the timeline head observed at start, so the query drains to
  // a fixed point and terminates even while writers keep committing.
  @volatile private var availableNowCap: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.log.lastInstant().getOrElse("0"))

  private def maxCommitsPerTrigger: Option[Int] =
    spark.conf.getOption("spark.graft.stream.maxCommitsPerTrigger").map(_.toInt)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftOffset].instant
    val head = table.log.lastInstant().getOrElse("0")
    val cap = availableNowCap.fold(head)(c => if (c < head) c else head)
    maxCommitsPerTrigger match {
      case Some(n) if n > 0 =>
        val window = table.log.commits()
          .filter(c => c.instant > from && c.instant <= cap)
          .filter(c => c.action == "commit" || c.action == "replace")
          .take(n)
        GraftOffset(window.lastOption.map(_.instant).getOrElse(from))
      case _ => GraftOffset(cap)
    }
  }

  override def reportLatestOffset(): Offset =
    GraftOffset(table.log.lastInstant().getOrElse("0"))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].instant
    val to = end.asInstanceOf[GraftOffset].instant
    if (to <= from) return Array.empty
    val t = table
    val snap = t.log.snapshot()
    val rowCommits = snap.commits
      .filter(c => c.instant > from && c.instant <= to)
      .filter(c => c.action == "commit" || c.action == "replace")
    // same cursor-safety contract as readIncremental: a stream cannot
    // silently skip restored/adopted rows
    rowCommits.find(c => c.operation == "restore" || c.operation == "bootstrap")
      .foreach { c =>
        throw new IllegalStateException(
          s"graft stream range ($from, $to] crosses ${c.operation} commit " +
          s"${c.instant}: its rows are invisible to an incremental cursor. " +
          "Restart the stream from a fresh checkpoint (snapshot resync), " +
          s"then resume from ${c.instant}")
      }
    val touched = rowCommits.flatMap(_.added)
      .map(f => (f.partition, f.bucket)).toSet
    snap.liveFiles(Some(to))
      .filter(f => touched.contains((f.partition, f.bucket)))
      .groupBy(f => (f.partition, f.bucket))
      .map { case ((p, b), fs) =>
        val deltaBytes = fs.filter(_.delta).map(_.bytes).sum
        if (deltaBytes > maxDeltaBytes)
          throw new IllegalStateException(
            s"graft stream read of $root group (partition=$p, bucket=$b) " +
            s"would buffer $deltaBytes delta bytes, over " +
            s"spark.graft.mor.maxDeltaBytesPerGroup=$maxDeltaBytes: compact " +
            "the table first (TableServices.compact / CALL run_compaction), " +
            "or raise the cap")
        GraftMorInputPartition(
          fs.filterNot(_.delta).map(f => FileSlice(s"$root/${f.path}", f.bytes)).toArray,
          fs.filter(_.delta).map(f => FileSlice(s"$root/${f.path}", f.bytes)).toArray,
          s"(partition=$p, bucket=$b)",
          ctLo = Some(from), ctHi = Some(to))
      }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cfg = table.config
    // unlike the batch scan there is no column pruning on this path
    // (the stream emits the full table schema), so the merge superset
    // IS the table schema and the output mapping is the identity —
    // the batch path's need/filter dance would be a no-op here
    val superset = tableSchema
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark,
      dataSchema = tableSchema,
      partitionSchema = new StructType(),
      requiredSchema = superset,
      filters = Nil,
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConfWithOptions(Map.empty))
    GraftMorReaderFactory(readFunc, superset,
      tableSchema.fieldNames.map(superset.fieldIndex),
      superset.fieldIndex(cfg.keyField),
      superset.fieldIndex(cfg.orderingField),
      superset.fieldIndex(TableConfig.CommitTimeCol),
      superset.fieldIndex(cfg.softDeleteField),
      s"graft_stream($root)", maxDeltaRows = maxDeltaRows)
    // the commit-range visibility filter rides in each InputPartition
    // (set by planInputPartitions) — the factory stays batch-agnostic
  }
}
