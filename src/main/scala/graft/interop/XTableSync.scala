package graft.interop

import graft.core.{CommitLog, GraftTable}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Format-interop metadata emission — the Apache xTable analog
  * (SURVEY.md §2.7 T6; reference xtable/xtable_hudi.yaml:17-25,
  * notebook/demo.ipynb conversionController.sync calls): expose the
  * SAME parquet data files under Delta-log and Iceberg-style metadata
  * so external engines can mount the table without copying data.
  *
  * Delta emission follows the public Delta transaction-log protocol
  * (one `_delta_log/<version>.json` of protocol/metaData/add/remove
  * actions; schemaString is the Spark StructType JSON Delta uses;
  * per-file stats carried like the reference's
  * _delta_log/00000000000000000000.json:3). Iceberg emission writes
  * the v2 `metadata/vN.metadata.json` shape with a JSON manifest
  * standing in for the avro manifest list (structural parity;
  * full avro manifests are the documented stretch).
  *
  * Sync is INCREMENTAL: a cursor under `.graft/` records the last
  * translated instant; each sync translates only newer commits
  * (xtable "incremental sync mode").
  */
object XTableSync {

  private val mapper = CommitLog.mapper

  private def cursorPath(t: GraftTable, fmt: String) =
    Paths.get(t.root, CommitLog.Dir, s"xtable-$fmt.cursor")

  private def readCursor(t: GraftTable, fmt: String): (String, Long) = {
    val p = cursorPath(t, fmt)
    if (!Files.exists(p)) ("0", -1L)
    else {
      val Array(instant, ver) = Files.readString(p).trim.split(":")
      (instant, ver.toLong)
    }
  }

  private def writeCursor(t: GraftTable, fmt: String, instant: String, ver: Long): Unit = {
    val p = cursorPath(t, fmt)
    val tmp = p.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, s"$instant:$ver")
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Translate commits newer than the cursor into Delta-log versions
    * (one Delta version per graft commit). Returns versions written. */
  def syncDelta(t: GraftTable): Seq[Long] = {
    val logDir = Paths.get(t.root, "_delta_log")
    Files.createDirectories(logDir)
    val (from, lastVer) = readCursor(t, "delta")
    val fresh = t.log.commits().filter(_.instant > from)
    if (fresh.isEmpty) return Nil
    var ver = lastVer
    val written = fresh.map { c =>
      ver += 1
      val actions = scala.collection.mutable.ArrayBuffer[String]()
      if (ver == 0L) {
        actions += mapper.writeValueAsString(Map(
          "protocol" -> Map("minReaderVersion" -> 1, "minWriterVersion" -> 2)))
        actions += mapper.writeValueAsString(Map(
          "metaData" -> Map(
            "id" -> java.util.UUID.nameUUIDFromBytes(t.root.getBytes).toString,
            "name" -> t.config.name,
            "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
            "schemaString" -> t.schema.json,
            "partitionColumns" -> t.config.partitionField.toSeq,
            "configuration" -> Map.empty,
            "createdTime" -> 0L)))
      }
      c.removed.foreach { path =>
        actions += mapper.writeValueAsString(Map(
          "remove" -> Map("path" -> path, "dataChange" -> true,
            "deletionTimestamp" -> c.instant.toLong)))
      }
      c.added.foreach { f =>
        val stats = Map(
          "numRecords" -> f.rows,
          "minValues" -> f.stats.map { case (k, v) => k -> v.min },
          "maxValues" -> f.stats.map { case (k, v) => k -> v.max },
          "nullCount" -> f.stats.map { case (k, v) => k -> v.nullCount })
        actions += mapper.writeValueAsString(Map(
          "add" -> Map(
            "path" -> f.path,
            "partitionValues" -> t.config.partitionField.map(p => Map(p -> f.partition)).getOrElse(Map.empty),
            "size" -> f.bytes,
            "modificationTime" -> c.instant.toLong,
            "dataChange" -> true,
            "stats" -> mapper.writeValueAsString(stats))))
      }
      Files.write(logDir.resolve(f"$ver%020d.json"),
        actions.mkString("", "\n", "\n").getBytes("UTF-8"))
      ver
    }
    writeCursor(t, "delta", fresh.last.instant, ver)
    written
  }

  /** Translate the current table state into Iceberg-style metadata:
    * `metadata/v<N>.metadata.json` + one JSON manifest per snapshot.
    * One Iceberg snapshot per sync (table-state granularity, like
    * xTable's snapshot sync). */
  def syncIceberg(t: GraftTable): Option[Long] = {
    val metaDir = Paths.get(t.root, "metadata")
    Files.createDirectories(metaDir)
    val (from, lastVer) = readCursor(t, "iceberg")
    val latest = t.log.lastInstant().getOrElse("0")
    if (latest <= from) return None
    val ver = lastVer + 1
    val snapshotId = latest.toLong
    val live = t.log.liveFiles()
    val manifest = live.map { f =>
      Map("data_file" -> Map(
        "file_path" -> s"${t.root}/${f.path}",
        "file_format" -> "PARQUET",
        "partition" -> t.config.partitionField.map(p => Map(p -> f.partition)).getOrElse(Map.empty),
        "record_count" -> f.rows,
        "file_size_in_bytes" -> f.bytes))
    }
    val manifestPath = metaDir.resolve(s"manifest-$snapshotId.json")
    Files.write(manifestPath,
      manifest.map(mapper.writeValueAsString).mkString("\n").getBytes("UTF-8"))
    val fields = t.schema.fields.zipWithIndex.map { case (f, i) =>
      Map("id" -> (i + 1), "name" -> f.name, "required" -> false,
        "type" -> icebergType(f.dataType))
    }
    val meta = Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.nameUUIDFromBytes(t.root.getBytes).toString,
      "location" -> t.root,
      "last-sequence-number" -> ver,
      "last-updated-ms" -> snapshotId,
      "last-column-id" -> fields.length,
      "schemas" -> Seq(Map("schema-id" -> 0, "type" -> "struct", "fields" -> fields)),
      "current-schema-id" -> 0,
      "partition-specs" -> Seq(Map(
        "spec-id" -> 0,
        "fields" -> t.config.partitionField.toSeq.zipWithIndex.map { case (p, i) =>
          Map("name" -> p, "transform" -> "identity",
            "source-id" -> (t.schema.fieldNames.indexOf(p) + 1),
            "field-id" -> (1000 + i))
        })),
      "default-spec-id" -> 0,
      "current-snapshot-id" -> snapshotId,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> snapshotId,
        "timestamp-ms" -> snapshotId,
        "manifest-list" -> manifestPath.toString,
        "summary" -> Map("operation" -> "append",
          "total-records" -> live.map(_.rows).sum.toString,
          "total-data-files" -> live.size.toString))))
    Files.write(metaDir.resolve(s"v$ver.metadata.json"),
      mapper.writeValueAsBytes(meta))
    writeCursor(t, "iceberg", latest, ver)
    Some(ver)
  }

  private def icebergType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "long"
      case IntegerType => "int"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "boolean"
      case StringType => "string"
      case BinaryType => "binary"
      case DateType => "date"
      case _: TimestampType => "timestamptz"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case _ => "string"
    }
  }
}
