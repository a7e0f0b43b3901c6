package graft.interop

import graft.core.{CommitLog, GraftTable}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions.{col, struct, to_json}
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
  * the v2 `metadata/vN.metadata.json` shape plus REAL Avro manifests —
  * the two-layer manifest-list → manifest-file structure of the
  * Iceberg spec, written with avro-core and round-trip-verified by
  * test (no Iceberg runtime jar exists in this environment, so
  * external-engine readback is asserted structurally, not mounted).
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

  private def metaDataAction(t: GraftTable, schemaJson: String,
      changeDataFeed: Boolean = false): String =
    mapper.writeValueAsString(Map(
      "metaData" -> Map(
        "id" -> java.util.UUID.nameUUIDFromBytes(t.root.getBytes).toString,
        "name" -> t.config.name,
        "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
        "schemaString" -> schemaJson,
        "partitionColumns" -> t.config.partitionField.toSeq,
        "configuration" ->
          (if (changeDataFeed) Map("delta.enableChangeDataFeed" -> "true")
           else Map.empty),
        "createdTime" -> 0L)))

  /** The Delta protocol stores `add`/`remove` paths URL-ENCODED
    * (RFC 2396): encode on write, decode on replay. Round-trip is
    * exact — the URI constructor always quotes '%' itself, so a
    * literal `%20` in one of our escapeDir-produced directory names
    * survives as `%2520`. Foreign logs (Delta-Spark and friends
    * encode per spec) decode to real filesystem paths. */
  private def encodeDeltaPath(p: String): String =
    // the './' prefix stops URI from reading a ':' in the FIRST
    // segment as a scheme delimiter (a foreign partition dir like
    // 'ts=2020-01-01 12:30:00/...' would otherwise throw
    // URISyntaxException, or a scheme-shaped segment would null out
    // getRawPath); ':' inside later segments is legal raw path syntax
    new java.net.URI(null, null, "./" + p, null).getRawPath.stripPrefix("./")

  private def decodeDeltaPath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  private def removeAction(path: String, tsMs: Long,
      dataChange: Boolean = true): String =
    mapper.writeValueAsString(Map(
      "remove" -> Map("path" -> encodeDeltaPath(path),
        "dataChange" -> dataChange, "deletionTimestamp" -> tsMs)))

  private def addAction(t: GraftTable, instantMs: Long,
      f: graft.core.DataFileMeta, dataChange: Boolean = true): String = {
    val stats = Map(
      "numRecords" -> f.rows,
      "minValues" -> f.stats.map { case (k, v) => k -> v.min },
      "maxValues" -> f.stats.map { case (k, v) => k -> v.max },
      "nullCount" -> f.stats.map { case (k, v) => k -> v.nullCount })
    mapper.writeValueAsString(Map(
      "add" -> Map(
        "path" -> encodeDeltaPath(f.path),
        "partitionValues" -> t.config.partitionField
          .map(p => Map(p -> f.partition)).getOrElse(Map.empty),
        "size" -> f.bytes,
        "modificationTime" -> instantMs,
        "dataChange" -> dataChange,
        "stats" -> mapper.writeValueAsString(stats))))
  }

  /** One row commit's CDC as change-data parquet + its `cdc` action
    * lines: reads exactly that commit's changes with pre-images
    * through the table's own CDC, maps the vocabulary to the public
    * CDF one, writes `_change_data/cdc-<ver>-*.parquet`, and returns
    * one action per part file (dataChange=false — change files
    * describe, they do not change state). An empty change set still
    * writes one empty file: the action's presence is what stops a
    * CDF reader from falling back to add/remove derivation. */
  private def cdcActions(t: GraftTable, prevInstant: String,
      ver: Long): Seq[String] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val cdc = t.readCdc(prevInstant, maxCommits = 1, withPreimages = true)
    val vocab = when(col("_change_type") === "i", lit("insert"))
      .when(col("_change_type") === "d", lit("delete"))
      .when(col("_change_type") === "ub", lit("update_preimage"))
      .otherwise(lit("update_postimage"))
    val dataCols = cdc.columns
      .filterNot(c => c == "_change_type" || c == "_partition_path").toSeq
    val out = cdc.select(
      dataCols.map(col) :+ vocab.as("_change_type"): _*)
    val cdDir = Paths.get(t.root, "_change_data")
    Files.createDirectories(cdDir)
    val tmp = Paths.get(t.root, s".cdc-$ver-tmp")
    def writeParts(df: org.apache.spark.sql.DataFrame) = {
      df.write.mode("overwrite").parquet(tmp.toString)
      graft.util.Fs.list(tmp)(
        _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
        .sortBy(_.getFileName.toString)
    }
    val parts = {
      val p = writeParts(out)
      if (p.nonEmpty) p else writeParts(out.coalesce(1))
    }
    val actions = parts.zipWithIndex.map { case (p, i) =>
      val dest = cdDir.resolve(f"cdc-$ver%020d-$i%05d.parquet")
      Files.move(p, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      mapper.writeValueAsString(Map("cdc" -> Map(
        "path" -> encodeDeltaPath(s"_change_data/${dest.getFileName}"),
        "partitionValues" -> Map.empty,
        "size" -> Files.size(dest),
        "dataChange" -> false)))
    }
    graft.util.TempDirs.deleteRecursively(tmp)
    actions
  }

  /** Translate commits newer than the cursor into Delta-log versions
    * (one Delta version per graft commit). Returns versions written.
    *
    * `changeDataFeed = true` additionally emits the public CHANGE DATA
    * FEED protocol per row commit: the commit's own CDC (the table's
    * [[graft.core.GraftTable.readCdc]] with pre-images) lands as
    * `_change_data/` parquet named by `cdc` actions (vocabulary
    * insert / delete / update_preimage / update_postimage), service
    * commits' file swaps carry `dataChange=false` so derivation-mode
    * readers skip them, and metaData declares
    * `delta.enableChangeDataFeed=true`. [[readDeltaChanges]] (or any
    * CDF reader) then serves the exact row-level history. Restrictions
    * match the CDC the feed is built from: MOR tables refuse (the
    * foreign log tracks the read-optimized view — row changes would
    * surface before the RO view moves), and a restore/bootstrap in
    * the unsynced range refuses (those rows cannot be classified as
    * changes — resync from a snapshot). cdc files carry all columns
    * inline with empty partitionValues (how an unpartitioned reader
    * consumes them); the data files beside them keep their partition
    * encoding. */
  def syncDelta(t: GraftTable): Seq[Long] =
    syncDelta(t, changeDataFeed = false)

  def syncDelta(t: GraftTable, changeDataFeed: Boolean): Seq[Long] = {
    val logDir = Paths.get(t.root, "_delta_log")
    Files.createDirectories(logDir)
    val (from, lastVer) = readCursor(t, "delta")
    val fresh = t.log.commits().filter(_.instant > from)
    if (fresh.isEmpty) return Nil
    if (changeDataFeed) {
      require(!t.config.isMor,
        s"change-data-feed sync of MOR table ${t.config.name}: the " +
        "foreign log tracks the read-optimized view, so row changes " +
        "would surface in the feed before the RO view moves — compact " +
        "to COW semantics first or sync without change_data_feed")
      fresh.find(c => c.operation == "restore" || c.operation == "bootstrap")
        .foreach(c => throw new IllegalArgumentException(
          s"change-data-feed sync range crosses ${c.operation} commit " +
          s"${c.instant}: those rows cannot be classified as changes — " +
          "resync the export from a snapshot, then resume"))
    }
    var ver = lastVer
    var prevInstant = from
    // Delta readers take the LAST metaData action as the schema: a
    // fresh one must be emitted whenever a commit evolves the schema —
    // the previous v0-only emission froze foreign readers on the
    // first-sync schema forever. Resumed syncs seed the comparison
    // with the schema as of the cursor.
    var lastSchema: String =
      if (lastVer < 0) null else t.log.latestSchemaJson(Some(from)).orNull
    val written = fresh.map { c =>
      ver += 1
      val actions = scala.collection.mutable.ArrayBuffer[String]()
      if (ver == 0L) {
        actions += mapper.writeValueAsString(Map(
          "protocol" -> Map("minReaderVersion" -> 1, "minWriterVersion" -> 2)))
        lastSchema = Option(c.schemaJson).filter(_.nonEmpty)
          .getOrElse(t.schema.json)
        actions += metaDataAction(t, lastSchema, changeDataFeed)
      } else Option(c.schemaJson).filter(_.nonEmpty).foreach { cs =>
        if (cs != lastSchema) {
          actions += metaDataAction(t, cs, changeDataFeed)
          lastSchema = cs
        }
      }
      // under CDF, a row commit is served from its change files; its
      // add/remove (and every service commit's) must not double-count
      // in derivation-mode readers — but only ROW commits' actions
      // keep dataChange=true (the flag means "rows changed here")
      val isRow = c.action == "commit" || c.action == "replace"
      if (changeDataFeed && isRow)
        actions ++= cdcActions(t, prevInstant, ver)
      val dc = !changeDataFeed || isRow
      // MOR: the foreign log tracks the READ-OPTIMIZED view — base
      // files only. Delta has no delta-file concept, so exporting a
      // MOR delta parquet as an add-action would make a foreign reader
      // scan it as plain data: BOTH versions of every upserted key
      // served, tombstone rows served as live. Delta-file removes
      // (compaction folding them away) are skipped symmetrically —
      // they were never added. COW commits carry no delta files, so
      // this is a no-op there.
      c.removed.foreach { path =>
        if (!path.endsWith(".delta.parquet"))
          actions += removeAction(path, c.instant.toLong, dataChange = dc)
      }
      c.added.foreach { f =>
        if (!f.delta) actions += addAction(t, c.instant.toLong, f,
          dataChange = dc)
      }
      Files.write(logDir.resolve(f"$ver%020d.json"),
        actions.mkString("", "\n", "\n").getBytes("UTF-8"))
      prevInstant = c.instant
      ver
    }
    writeCursor(t, "delta", fresh.last.instant, ver)
    written
  }

  /** Avro schema JSON for an Iceberg v2 `manifest_entry` (the required
    * field subset of the public spec, each field carrying its spec
    * `field-id`). The partition record holds the table's identity
    * partition column (field-id 1000), or no fields when
    * unpartitioned. */
  private def manifestEntrySchemaJson(partitionField: Option[String]): String = {
    val partFields = partitionField.map(p =>
      s"""{"name":"${p}","type":["null","string"],"default":null,"field-id":1000}""")
      .toSeq.mkString(",")
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
       |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
       |{"name":"content","type":"int","field-id":134},
       |{"name":"file_path","type":"string","field-id":100},
       |{"name":"file_format","type":"string","field-id":101},
       |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFields]}},
       |{"name":"record_count","type":"long","field-id":103},
       |{"name":"file_size_in_bytes","type":"long","field-id":104}
       |]}}]}""".stripMargin.replaceAll("\n", "")
  }

  /** Avro schema JSON for the Iceberg `manifest_file` (manifest list)
    * record, required v2 fields with spec field-ids. */
  private val manifestListSchemaJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin.replaceAll("\n", "")

  /** Translate the current table state into Iceberg v2 metadata:
    * `metadata/v<N>.metadata.json` → avro manifest LIST → avro
    * MANIFEST of data-file entries — the real two-layer avro layout
    * (round 1 wrote JSON stand-ins), written with avro-core under the
    * spec's record shapes and field-ids. One Iceberg snapshot per sync
    * (table-state granularity, like xTable's snapshot sync). */
  def syncIceberg(t: GraftTable): Option[Long] = {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val metaDir = Paths.get(t.root, "metadata")
    Files.createDirectories(metaDir)
    val (from, lastVer) = readCursor(t, "iceberg")
    val latest = t.log.lastInstant().getOrElse("0")
    if (latest <= from) return None
    val ver = lastVer + 1
    val snapshotId = latest.toLong
    // read-optimized view for MOR: base files only (see syncDelta)
    val live = t.log.liveFiles().filterNot(_.delta)

    // layer 2: the manifest — one entry per live data file
    val entrySchema = new Schema.Parser().parse(
      manifestEntrySchemaJson(t.config.partitionField))
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    val manifestPath = metaDir.resolve(s"manifest-$snapshotId-m0.avro")
    val mw = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
    mw.setMeta("format-version", "2")
    mw.setMeta("content", "data")
    mw.create(entrySchema, manifestPath.toFile)
    try live.foreach { f =>
      val part = new GenericData.Record(partSchema)
      t.config.partitionField.foreach(p => part.put(p, f.partition))
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 0)
      df.put("file_path", s"${t.root}/${f.path}")
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", f.rows)
      df.put("file_size_in_bytes", f.bytes)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED (snapshot-granularity sync)
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", ver)
      e.put("file_sequence_number", ver)
      e.put("data_file", df)
      mw.append(e)
    } finally mw.close()

    // layer 1: the manifest list pointing at the manifest
    val listSchema = new Schema.Parser().parse(manifestListSchemaJson)
    val listPath = metaDir.resolve(s"snap-$snapshotId.avro")
    val lw = new DataFileWriter(new GenericDatumWriter[GenericRecord](listSchema))
    lw.setMeta("format-version", "2")
    lw.create(listSchema, listPath.toFile)
    try {
      val m = new GenericData.Record(listSchema)
      m.put("manifest_path", manifestPath.toString)
      m.put("manifest_length", Files.size(manifestPath))
      m.put("partition_spec_id", 0)
      m.put("content", 0)
      m.put("sequence_number", ver)
      m.put("min_sequence_number", ver)
      m.put("added_snapshot_id", snapshotId)
      m.put("added_files_count", live.size)
      m.put("existing_files_count", 0)
      m.put("deleted_files_count", 0)
      m.put("added_rows_count", live.map(_.rows).sum)
      m.put("existing_rows_count", 0L)
      m.put("deleted_rows_count", 0L)
      lw.append(m)
    } finally lw.close()
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
        "sequence-number" -> ver,
        "timestamp-ms" -> snapshotId,
        "manifest-list" -> listPath.toString,
        "summary" -> Map("operation" -> "append",
          "total-records" -> live.map(_.rows).sum.toString,
          "total-data-files" -> live.size.toString))))
    Files.write(metaDir.resolve(s"v$ver.metadata.json"),
      mapper.writeValueAsBytes(meta))
    writeCursor(t, "iceberg", latest, ver)
    Some(ver)
  }

  // ------------------------------------------------------------------
  // External-reader readback: reconstruct the table purely from the
  // emitted metadata — what Trino/Delta/Iceberg readers would do when
  // mounting the synced table (xtable.md:54-59 register_table, demo
  // notebook cells 6-18). No graft commit log is consulted: these are
  // independent consumers of the public formats, used by tests to
  // prove the emitted metadata alone reproduces the snapshot.
  // ------------------------------------------------------------------

  /** Table state a generic Delta reader reconstructs by replaying the
    * `_delta_log`: last metaData wins, add/remove tracked per path. */
  final case class DeltaState(schemaJson: String,
      partitionColumns: Seq[String], liveFiles: Seq[String])

  /** The replayable `_delta_log` chain under `root`: an optional
    * single-part checkpoint seed plus the contiguous JSON versions
    * after it. Every unsound shape fails loudly instead of replaying a
    * wrong live set:
    *  - multi-part checkpoints (`N.checkpoint.0000000001.0000000002
    *    .parquet`, writers split at `delta.checkpoint.parts`) are READ
    *    — all parts load and union before replay (each action row
    *    lives in exactly one part); an INCOMPLETE part set is a
    *    crashed writer's debris, ignored unless `_last_checkpoint`
    *    names it, in which case it is refused loudly;
    *  - a `_last_checkpoint` naming a missing file is refused;
    *  - a GAP in the JSON chain (commits retention-cleaned without a
    *    covering checkpoint) is refused — replay would silently drop
    *    or resurrect files;
    *  - without a checkpoint the chain must start at version 0. */
  private final case class DeltaChain(
      checkpoint: Option[(Long, Seq[java.nio.file.Path])],
      jsons: Seq[(Long, java.nio.file.Path)]) {
    def lastVersion: Long =
      (checkpoint.map(_._1).toSeq ++ jsons.map(_._1)).max
  }

  /** (version, file) pairs of the JSON commit files under a log dir,
    * ascending — THE name-parsing rule, shared by every consumer. */
  private def listJsonVersions(logDir: java.nio.file.Path): Seq[(Long, java.nio.file.Path)] =
    graft.util.Fs.list(logDir)(_.map(_.getFileName.toString).toSeq)
      .filter(_.matches("\\d{20}\\.json")).sorted
      .map(n => n.stripSuffix(".json").toLong -> logDir.resolve(n))

  private val multiPartCpRe =
    "^(\\d{20})\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet$".r

  /** COMPLETE checkpoint shapes per version under a log dir. A version
    * may legitimately carry SEVERAL shapes at once — a single-part
    * file, complete multi-part sets at different part counts (each
    * keyed by its own `numParts`, the Delta layout's completeness
    * unit), and crash debris from abandoned writes. Shapes resolve
    * independently: the single-part file under key 1, each multi-part
    * group under its declared total but only when every part 1..n is
    * present. Incomplete groups (a crashed writer's debris) are
    * simply absent — they can never shadow a complete set at the same
    * version, and [[deltaChain]] refuses them only when
    * `_last_checkpoint` claims their part count. */
  private def checkpointSets(names: Seq[String],
      logDir: java.nio.file.Path)
      : Map[Long, Map[Long, Seq[java.nio.file.Path]]] = {
    val multi = names.flatMap(n => multiPartCpRe.findFirstMatchIn(n)
        .map(m => (m.group(1).toLong, m.group(2).toLong,
          m.group(3).toLong, n)))
      // completeness is per (version, numParts): debris at one part
      // count must never invalidate a complete set at another
      .groupBy(e => (e._1, e._3)).flatMap { case ((v, total), parts) =>
        val complete = total >= 1 &&
          parts.map(_._2).toSet == (1L to total).toSet
        if (complete)
          Some((v, total, parts.sortBy(_._2).map(p => logDir.resolve(p._4))))
        else None
      }.toSeq
    val single = names.collect {
      case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
        (n.stripSuffix(".checkpoint.parquet").toLong, 1L,
          Seq(logDir.resolve(n)))
    }
    (multi ++ single).groupBy(_._1).map { case (v, shapes) =>
      v -> shapes.map(sh => sh._2 -> sh._3).toMap
    }
  }

  private def deltaChain(root: String): DeltaChain = {
    val logDir = Paths.get(root, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $root")
    val names = graft.util.Fs.list(logDir)(
      _.map(_.getFileName.toString).toSeq)
    val cpSets = checkpointSets(names, logDir)
    // prefer the single-part shape when several complete shapes
    // coexist and _last_checkpoint does not arbitrate — any complete
    // shape is the same reconciled state, one file reads cheapest
    def pick(shapes: Map[Long, Seq[java.nio.file.Path]]): Seq[java.nio.file.Path] =
      shapes.getOrElse(1L, shapes(shapes.keys.min))
    val cpResolved: Option[(Long, Seq[java.nio.file.Path])] =
      if (names.contains("_last_checkpoint")) {
        val node = mapper.readTree(
          Files.readString(logDir.resolve("_last_checkpoint")))
        val v = node.get("version").asLong()
        val declaredParts =
          if (node.has("parts")) Some(node.get("parts").asLong()) else None
        val shapes = cpSets.getOrElse(v, Map.empty[Long, Seq[java.nio.file.Path]])
        require(shapes.nonEmpty,
          s"_last_checkpoint under $root names version $v but no complete " +
          s"checkpoint (single-part file or full multi-part set) for it " +
          "exists — the log is damaged or a multi-part write was lost")
        val chosen = declaredParts.filter(_ > 1) match {
          // _last_checkpoint arbitrates the SHAPE: resolve exactly the
          // declared part count, never a stale sibling shape
          case Some(p) => shapes.getOrElse(p, throw new IllegalArgumentException(
            s"_last_checkpoint under $root declares parts=$p for version " +
            s"$v but no complete $p-part set exists (complete shapes: " +
            s"${shapes.keys.toSeq.sorted.mkString(",")}) — refusing a " +
            "partial checkpoint read"))
          case None => pick(shapes)
        }
        Some(v -> chosen)
      } else cpSets.keys.maxOption.map(v => v -> pick(cpSets(v)))
    val cpVer = cpResolved.map(_._1)
    val cp = cpResolved
    val floor = cpVer.getOrElse(-1L)
    val jsons = listJsonVersions(logDir).filter(_._1 > floor)
    jsons.map(_._1).zipWithIndex.foreach { case (v, i) =>
      val expect = floor + 1 + i
      require(v == expect,
        s"_delta_log under $root is missing version $expect (next " +
        s"present: $v): JSON commits were removed without a covering " +
        "checkpoint, so a replay would silently drop or resurrect files")
    }
    require(cp.nonEmpty || jsons.nonEmpty, s"empty _delta_log under $root")
    DeltaChain(cp, jsons)
  }

  /** Every action of the replayable chain as one JSON line each, in
    * replay order. A checkpoint seed needs a SparkSession to read its
    * parquet; its rows are re-serialized one action per line
    * (protocol, metaData, remove tombstones, adds — order inside a
    * checkpoint is immaterial since it is a reconciled state, but
    * removes go before adds so a path both tombstoned and re-added by
    * later JSONs replays correctly). The checkpoint collect is
    * O(live files) driver metadata, the same order as the commit log
    * itself. */
  /** One action-JSON line per checkpoint-parquet row, in replay order
    * (removes before adds — a checkpoint is a reconciled state, so a
    * path tombstoned there cannot also be live there). */
  private def checkpointLines(spark: org.apache.spark.sql.SparkSession,
      ps: Seq[java.nio.file.Path]): Seq[String] = {
    // multi-part checkpoints union before replay: each action row
    // lives in exactly one part, so reading all parts as one relation
    // IS the spec's reconciled state. mergeSchema: without it parquet
    // resolves the relation from ONE part's footer, and a foreign
    // writer whose parts carry different column subsets (legal — a
    // part holding only adds need not spell the remove struct) would
    // have whole action classes silently DROPPED from the replay
    val df = spark.read.option("mergeSchema", "true")
      .parquet(ps.map(_.toString): _*)
    def part(colName: String): Seq[String] =
      if (df.columns.contains(colName))
        df.filter(col(colName).isNotNull)
          .select(to_json(struct(col(colName))))
          .collect().map(_.getString(0)).toSeq
      else Seq.empty
    part("protocol") ++ part("metaData") ++ part("remove") ++ part("add")
  }

  private def deltaActionLines(root: String,
      spark: Option[org.apache.spark.sql.SparkSession],
      keepJson: Long => Boolean = _ => true): Seq[String] = {
    val chain = deltaChain(root)
    val cpLines = chain.checkpoint match {
      case None => Seq.empty[String]
      case Some((v, ps)) =>
        val s = spark.getOrElse(throw new IllegalArgumentException(
          s"_delta_log under $root is checkpointed (version $v) — " +
          "replaying it reads the checkpoint parquet, which needs a " +
          "SparkSession: use replayDelta(root, spark) or adoptDelta"))
        checkpointLines(s, ps)
    }
    cpLines ++ chain.jsons.filter(j => keepJson(j._1)).flatMap { case (_, f) =>
      Files.readAllLines(f).asScala.filter(_.nonEmpty)
    }
  }

  /** Full replay state: the last metaData/protocol action lines, the
    * live map (decoded path → its add-action line), and the remove
    * TOMBSTONES of currently-dead paths (the Delta checkpoint must
    * carry them so a later VACUUM can still see what to clean after
    * the JSON commits expire). */
  private final case class DeltaReplay(schemaJson: String,
      partCols: Seq[String], protocolLine: Option[String],
      metaDataLine: Option[String],
      live: scala.collection.mutable.LinkedHashMap[String, String],
      tombstones: scala.collection.mutable.LinkedHashMap[String, String])

  /** Refuse to REPLAY actions whose row-level semantics this replay
    * does not implement — the [[requireCheckpointable]] envelope
    * applied to the read/adopt side. Without it, a real Delta table
    * with deletion vectors (protocol (3,7), `add.deletionVector`) is
    * adopted/read with its deleted rows RESURRECTED, and one with
    * column mapping (`delta.columnMapping.mode=name`) has its physical
    * parquet columns misread under logical names — both silently.
    * Every other unsound shape in this module is refused loudly; so
    * are these. */
  private def jsonPresent(n: com.fasterxml.jackson.databind.JsonNode,
      f: String): Boolean = n != null && n.has(f) && !n.get(f).isNull

  /** The deletion-vector guard BOTH action-level gates share
    * ([[requireReplayable]] and [[requireCheckpointable]]): a DV'd
    * add/remove means row-level deletes this engine neither applies
    * nor preserves — replaying or re-checkpointing it would silently
    * resurrect deleted rows. */
  private def requireNoDeletionVectors(ctx: String,
      a: com.fasterxml.jackson.databind.JsonNode, remedy: String): Unit =
    Seq("add", "remove").foreach { k =>
      if (jsonPresent(a, k))
        require(!jsonPresent(a.get(k), "deletionVector"),
          s"_delta_log under $ctx carries $k.deletionVector — row-level " +
          s"deletes would silently resurrect; $remedy")
    }

  private def requireReplayable(ctx: String,
      a: com.fasterxml.jackson.databind.JsonNode,
      dvRead: Boolean = false): Unit = {
    def present(n: com.fasterxml.jackson.databind.JsonNode,
        f: String): Boolean = jsonPresent(n, f)
    // [[readDelta]] APPLIES deletion vectors and column mapping
    // (dvRead=true), so its replay accepts DV'd adds, mapped schemas,
    // and the matching raised protocols; every other replay consumer
    // (adoption, sync, checkpoint) keeps the refusal — they REPRESENT
    // the live set rather than read it, and neither a DV'd add nor a
    // physically-renamed schema can be represented without
    // resurrecting rows or misreading columns.
    if (!dvRead)
      requireNoDeletionVectors(ctx, a,
        "read it with readDelta (which applies deletion vectors) or " +
        "checkpoint/rewrite from the source engine first")
    if (present(a, "protocol")) {
      val p = a.get("protocol")
      // READ-side envelope only: minReaderVersion governs what a
      // correct read means (DVs, column mapping, v2 checkpoints all
      // raise it or add readerFeatures). Writer-only features
      // (appendOnly, CDF, invariants — minWriterVersion 3..7 with no
      // reader impact) do NOT change replay semantics and are accepted
      // here; [[adoptDelta]] applies the stricter WRITER envelope
      // separately, because adoption continues the log with this
      // engine's own (1,2)-shaped commits.
      require(present(p, "minReaderVersion"),
        s"_delta_log under $ctx has a protocol action without " +
        "minReaderVersion — a malformed log this replay refuses rather " +
        "than guessing a read envelope for")
      val mrv = p.get("minReaderVersion").asInt()
      val plainOk = mrv <= 1 && !present(p, "readerFeatures")
      // the read path implements TWO raised envelopes: legacy
      // minReaderVersion=2 (column mapping) and (3, readerFeatures ⊆
      // {deletionVectors, columnMapping}); a missing features list at
      // mrv=3 is malformed (the spec requires it) and anything else
      // in the list still changes what a correct read means
      lazy val readOk = dvRead && (
        (mrv == 2 && !present(p, "readerFeatures")) ||
        (mrv == 3 && present(p, "readerFeatures") &&
          p.get("readerFeatures").elements().asScala.map(_.asText())
            .forall(Set("deletionVectors", "columnMapping"))))
      require(plainOk || readOk,
        s"_delta_log under $ctx declares protocol " +
        s"${mapper.writeValueAsString(mapper.treeToValue(p, classOf[Object]))} " +
        "— beyond the supported read envelope (reader features change " +
        "what a correct read means" +
        (if (dvRead)
          "; deletionVectors and columnMapping are the implemented set"
        else
          "; deletion vectors and column mapping apply only via readDelta") +
        "); checkpoint/rewrite from the source engine first")
    }
    if (present(a, "metaData")) {
      val conf = a.get("metaData").get("configuration")
      if (present(conf, "delta.columnMapping.mode")) {
        val mode = conf.get("delta.columnMapping.mode").asText()
        if (dvRead)
          // name and id modes both persist every field's physicalName
          // ([[physicalSchema]] reads by it and refuses a field
          // missing one); any OTHER mode string is from a future spec
          require(mode == "none" || mode == "name" || mode == "id",
            s"_delta_log under $ctx sets delta.columnMapping.mode=" +
            s"$mode — not a mode this reader knows (none/name/id)")
        else
          require(mode == "none",
            s"_delta_log under $ctx sets delta.columnMapping.mode=" +
            s"$mode — physical parquet names differ from logical " +
            "schema names and this replay reads parquet by name; read " +
            "it with readDelta (which remaps) or rewrite from the " +
            "source engine first")
      }
    }
  }

  /** WRITER envelope for adoption: [[adoptDelta]] CONTINUES the
    * foreign log with this engine's own commits, which honor only the
    * (minReaderVersion=1, minWriterVersion=2) contract — writing into
    * a table whose protocol demands writer features (CDF change files,
    * invariants, appendOnly enforcement) would silently violate them
    * for every other writer/reader of that table. Read-only paths
    * ([[readDelta]], register_table) do NOT apply this. */
  private def requireWriterEnvelope(root: String, lines: Seq[String]): Unit =
    lines.foreach { line =>
      val a = mapper.readTree(line)
      if (a.has("protocol") && !a.get("protocol").isNull) {
        val p = a.get("protocol")
        require(jsonPresent(p, "minWriterVersion"),
          s"_delta_log under $root has a protocol action without " +
          "minWriterVersion — a malformed log adoption refuses rather " +
          "than guessing a writer envelope for")
        require(p.get("minWriterVersion").asInt() <= 2 &&
            !(p.has("writerFeatures") && !p.get("writerFeatures").isNull),
          s"_delta_log under $root declares protocol " +
          s"${mapper.writeValueAsString(mapper.treeToValue(p, classOf[Object]))} " +
          "— adoption would CONTINUE this log with (minWriterVersion=2)-" +
          "shaped commits, silently violating the declared writer " +
          "features; read it with readDelta, or rewrite from the source " +
          "engine before adopting")
      }
    }

  private def replayActions(lines: Seq[String],
      ctx: String = "(unknown root)",
      dvRead: Boolean = false): DeltaReplay = {
    var schemaJson = ""
    var partCols = Seq.empty[String]
    var protocol: Option[String] = None
    var metaLine: Option[String] = None
    val live = scala.collection.mutable.LinkedHashMap[String, String]()
    val tombs = scala.collection.mutable.LinkedHashMap[String, String]()
    lines.foreach { line =>
      val a = mapper.readTree(line)
      requireReplayable(ctx, a, dvRead)
      if (a.has("protocol") && !a.get("protocol").isNull)
        protocol = Some(mapper.writeValueAsString(
          Map("protocol" -> mapper.treeToValue(a.get("protocol"), classOf[Object]))))
      if (a.has("metaData") && !a.get("metaData").isNull) {
        metaLine = Some(mapper.writeValueAsString(
          Map("metaData" -> mapper.treeToValue(a.get("metaData"), classOf[Object]))))
        schemaJson = a.get("metaData").get("schemaString").asText()
        partCols = a.get("metaData").get("partitionColumns")
          .elements().asScala.map(_.asText()).toSeq
      }
      if (a.has("add") && !a.get("add").isNull) {
        val p = decodeDeltaPath(a.get("add").get("path").asText())
        live += p -> mapper.writeValueAsString(
          Map("add" -> mapper.treeToValue(a.get("add"), classOf[Object])))
        tombs -= p
        ()
      }
      if (a.has("remove") && !a.get("remove").isNull) {
        val p = decodeDeltaPath(a.get("remove").get("path").asText())
        live -= p
        tombs += p -> mapper.writeValueAsString(
          Map("remove" -> mapper.treeToValue(a.get("remove"), classOf[Object])))
        ()
      }
    }
    require(schemaJson.nonEmpty, "log replay found no metaData action")
    DeltaReplay(schemaJson, partCols, protocol, metaLine, live, tombs)
  }

  /** The Delta checkpoint-parquet schema (the protocol's required field
    * subset) — EXPLICIT, never inferred: schema inference from the
    * action lines would prune `add.partitionValues` when every value
    * is `{}` (an unpartitioned export) and type it struct instead of
    * map<string,string> otherwise, handing real Delta readers a
    * checkpoint that violates the spec. Exotic optional fields a
    * foreign log may carry are dropped on checkpointing (the required
    * set below is what readers resolve state from). */
  private def checkpointSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val pv = MapType(StringType, StringType)
    StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", pv)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", pv),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", pv),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType))))))
  }

  /** JSON-only replay — refuses checkpointed logs (they need
    * [[replayDelta(root:String,spark*]] to read the checkpoint). */
  def replayDelta(root: String): DeltaState = replayDelta(root, None)

  /** Checkpoint-aware replay: seeds the live set from the latest
    * single-part checkpoint (if any) and applies the JSON versions
    * after it — the reconstruction a real Delta reader performs, and
    * the one that survives log-retention cleaning. */
  def replayDelta(root: String,
      spark: org.apache.spark.sql.SparkSession): DeltaState =
    replayDelta(root, Some(spark))

  private def replayDelta(root: String,
      spark: Option[org.apache.spark.sql.SparkSession]): DeltaState = {
    val st = replayActions(deltaActionLines(root, spark), root)
    DeltaState(st.schemaJson, st.partCols, st.live.keys.toSeq)
  }

  /** Write a single-part Delta CHECKPOINT at the log's current head
    * version (the public checkpoint protocol: one parquet of the
    * reconciled protocol/metaData/add actions as nullable struct
    * columns, then `_last_checkpoint` naming it — readers that see
    * `_last_checkpoint` must find the file, so it is written LAST,
    * atomically). After a checkpoint, [[expireDeltaLog]] may delete
    * the JSON commits it covers — the log-retention flow every real
    * Delta writer runs, without which a long-lived export accumulates
    * an O(commits) JSON chain that every foreign mount must replay.
    *
    * Works on any replayable `_delta_log` (a graft export or a foreign
    * table), not just graft-owned roots. Returns the checkpointed
    * version. */
  /** Refuse to checkpoint a log whose replayed state the explicit
    * [[checkpointSchema]] cannot carry — the spec requires a checkpoint
    * to preserve ALL `txn` (setTransaction) actions, deletion vectors,
    * and table-feature protocol rows, and after [[expireDeltaLog]]
    * deletes the covered JSONs that state would be permanently lost
    * (a foreign streaming writer's idempotency silently corrupted, a
    * DV'd file silently resurrecting its deleted rows). Every other
    * unsound shape in this module is refused loudly; this one is too. */
  private def requireCheckpointable(root: String, lines: Seq[String]): Unit =
    lines.foreach { line =>
      val a = mapper.readTree(line)
      def present(n: com.fasterxml.jackson.databind.JsonNode,
          f: String): Boolean = n.has(f) && !n.get(f).isNull
      require(!present(a, "txn"),
        s"_delta_log under $root carries setTransaction (txn) actions — " +
        "the Delta spec requires a checkpoint to preserve them and this " +
        "writer's checkpoint schema does not; checkpoint from the source " +
        "engine instead")
      requireNoDeletionVectors(root, a,
        "checkpoint from the source engine instead")
      if (present(a, "protocol")) {
        val p = a.get("protocol")
        require(p.get("minReaderVersion").asInt() <= 1 &&
            p.get("minWriterVersion").asInt() <= 2 &&
            !present(p, "readerFeatures") && !present(p, "writerFeatures"),
          s"_delta_log under $root declares protocol " +
          s"${mapper.writeValueAsString(mapper.treeToValue(p, classOf[Object]))} " +
          "— beyond the supported (minReaderVersion=1, minWriterVersion=2) " +
          "envelope; checkpoint from the source engine instead")
      }
    }

  /** A prior FOREIGN checkpoint may carry state in columns
    * [[checkpointLines]] never extracts (txn, add.deletionVector) —
    * invisible to the line-level guard above, so probed at the parquet
    * level before this writer re-checkpoints on top of it. */
  private def requireCheckpointSeedCarryable(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ps: Seq[java.nio.file.Path]): Unit = {
    val df = spark.read.option("mergeSchema", "true")
      .parquet(ps.map(_.toString): _*)
    val p = ps.head.getParent.resolve(
      if (ps.size == 1) ps.head.getFileName.toString
      else s"${ps.head.getFileName} (+${ps.size - 1} parts)")
    if (df.columns.contains("txn"))
      require(df.filter(col("txn").isNotNull).isEmpty,
        s"checkpoint $p carries txn (setTransaction) rows this writer's " +
        "checkpoint schema cannot preserve; checkpoint from the source " +
        "engine instead")
    Seq("add", "remove").foreach { k =>
      if (df.columns.contains(k) &&
          df.schema(k).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.contains("deletionVector"))
        require(df.filter(col(s"$k.deletionVector").isNotNull).isEmpty,
          s"checkpoint $p carries $k.deletionVector rows; checkpoint from " +
          "the source engine instead")
    }
  }

  def checkpointDelta(spark: org.apache.spark.sql.SparkSession,
      root: String): Long = checkpointDelta(spark, root, parts = 1)

  /** Multi-part variant (`delta.checkpoint.parts` in real writers):
    * the reconciled action set splits into ≤ `parts` part files — at
    * 100 TB a table's checkpoint is O(live files) rows and a single
    * parquet becomes the bottleneck of every foreign mount; parts
    * bound the file size and parallelize the reader's seed scan. Each
    * action lands in exactly ONE part (the spec's only requirement);
    * all parts share the explicit [[checkpointSchema]]. Fewer actions
    * than `parts` writes fewer parts. `_last_checkpoint` declares the
    * part count LAST, atomically — a crash mid-write leaves an
    * incomplete set no reader consults (crash debris per
    * [[checkpointSets]]). */
  def checkpointDelta(spark: org.apache.spark.sql.SparkSession,
      root: String, parts: Int): Long = {
    require(parts >= 1, s"parts=$parts")
    val chain = deltaChain(root)
    val v = chain.lastVersion
    chain.checkpoint.foreach { case (_, ps) =>
      requireCheckpointSeedCarryable(spark, root, ps) }
    val rawLines = deltaActionLines(root, Some(spark))
    requireCheckpointable(root, rawLines)
    val st = replayActions(rawLines, root)
    // a continued foreign log may have had its protocol action expired
    // with a previous checkpoint's JSONs; re-seed the default
    val protocol = st.protocolLine.getOrElse(mapper.writeValueAsString(
      Map("protocol" -> Map("minReaderVersion" -> 1, "minWriterVersion" -> 2))))
    val lines = Seq(protocol) ++ st.metaDataLine.toSeq ++
      st.tombstones.values.toSeq ++ st.live.values.toSeq
    val logDir = Paths.get(root, "_delta_log")
    import spark.implicits._
    def writeOne(chunk: Seq[String], target: java.nio.file.Path): Unit = {
      val tmpd = logDir.resolve(s".cp-tmp-${java.util.UUID.randomUUID()}")
      spark.read.schema(checkpointSchema).json(spark.createDataset(chunk))
        .coalesce(1).write.parquet(tmpd.toString)
      val part = graft.util.Fs.list(tmpd)(
        _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      graft.util.TempDirs.deleteRecursively(tmpd)
    }
    val lcJson =
      if (parts == 1) {
        writeOne(lines, logDir.resolve(f"$v%020d.checkpoint.parquet"))
        s"""{"version":$v,"size":${lines.size}}"""
      } else {
        // round-robin deal: exactly min(parts, actions) part files,
        // each action in exactly one part (the spec's only requirement)
        val n = math.min(parts, lines.size)
        val chunks = lines.zipWithIndex.groupBy(_._2 % n)
          .toSeq.sortBy(_._1).map(_._2.map(_._1))
        chunks.zipWithIndex.foreach { case (chunk, i) =>
          writeOne(chunk, logDir.resolve(
            f"$v%020d.checkpoint.${i + 1}%010d.$n%010d.parquet"))
        }
        s"""{"version":$v,"size":${lines.size},"parts":$n}"""
      }
    val tmpf = logDir.resolve(s".tmp-lc-${java.util.UUID.randomUUID()}")
    Files.writeString(tmpf, lcJson)
    Files.move(tmpf, logDir.resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Delta log-retention cleaning: delete the JSON commits the
    * `_last_checkpoint` version covers, except the newest
    * `keepVersions` of them (kept JSONs are redundant with the
    * checkpoint but serve incremental/table_changes consumers that
    * replay recent commits). Refuses to clean an uncheckpointed log.
    * Returns the deleted versions. */
  def expireDeltaLog(root: String, keepVersions: Int = 0): Seq[Long] = {
    require(keepVersions >= 0, s"keepVersions=$keepVersions")
    val logDir = Paths.get(root, "_delta_log")
    require(Files.exists(logDir.resolve("_last_checkpoint")),
      s"_delta_log under $root has no _last_checkpoint — run " +
      "checkpointDelta before expiring JSON commits")
    val chain = deltaChain(root) // validates the checkpoint file exists
    val cpV = chain.checkpoint.get._1
    listJsonVersions(logDir)
      .filter(_._1 <= cpV - keepVersions)
      .map { case (ver, f) => Files.delete(f); ver }
  }

  /** Reverse xTable leg (reference xtable/xtable_delta.yaml:17-25 —
    * `sourceFormat: DELTA`, targetFormats HUDI/ICEBERG): adopt an
    * EXISTING Delta table at `root` as a graft table IN PLACE that
    * continues to accept upserts, with its Delta history mapped.
    *
    *  - the `_delta_log` is replayed to the LIVE file set — versions
    *    still on disk that the log has removed are NOT resurrected;
    *  - live files are metadata-only bootstrap-adopted (hard links +
    *    one stats scan, no data rewrite) into the graft layout;
    *  - the `_delta_log` CONTINUES across the migration: a reconcile
    *    version (last foreign version + 1) removes the foreign paths
    *    and re-adds the SAME bytes at their adopted graft paths
    *    (pure metadata churn), and the delta sync cursor is seeded at
    *    (bootstrap instant, reconcile version) so future [[syncDelta]]
    *    calls translate only post-adoption commits. A foreign Delta
    *    reader replaying the whole log sees an unbroken history —
    *    identical rows immediately before and after adoption.
    *
    * The caller supplies the graft `config` (record key / ordering /
    * buckets are engine concepts a Delta log doesn't carry). With a
    * MOR config, adopted parquet become the BASE files and subsequent
    * upserts append deltas — the migration path for a streaming-heavy
    * Delta lake (the reference's default demo table type,
    * hudi-spark-minio-trino/README.md:341-344); overlapping bootstrap
    * files fold into hash-routed groups on first touch (see
    * [[graft.core.GraftTable.bootstrapFromFiles]]). Note the foreign
    * `_delta_log` continues to describe BASE files only (the
    * read-optimized view) — Delta has no delta-file concept, so a
    * foreign reader's rows lag the realtime view until compaction,
    * exactly like xTable's RO sync targets. */
  def adoptDelta(spark: org.apache.spark.sql.SparkSession, root: String,
      config: graft.core.TableConfig): GraftTable = {
    require(!GraftTable.exists(root), s"$root is already a graft table")
    requireWriterEnvelope(root, deltaActionLines(root, Some(spark)))
    val st = replayDelta(root, spark)
    require(st.liveFiles.nonEmpty, s"Delta table at $root has no live files")
    val lastForeignVer = deltaChain(root).lastVersion
    val t = GraftTable.create(spark, root, config)
    val instant = t.bootstrapFromFiles(
      st.liveFiles.map(p => Paths.get(root, p)))
    val commit = t.log.commits().last
    val ver = lastForeignVer + 1
    val actions = scala.collection.mutable.ArrayBuffer[String]()
    // graft's schema supersedes the foreign schemaString: same data
    // columns (bootstrap adopted them verbatim) + the engine's nullable
    // meta columns, which adopted files simply read as null
    actions += metaDataAction(t, commit.schemaJson)
    st.liveFiles.foreach(p => actions += removeAction(p, instant.toLong))
    commit.added.foreach(f => actions += addAction(t, instant.toLong, f))
    Files.write(Paths.get(root, "_delta_log").resolve(f"$ver%020d.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    writeCursor(t, "delta", instant, ver)
    t
  }

  /** The Iceberg twin of [[adoptDelta]] (xtable/xtable_iceberg.yaml:
    * 17-24 — `sourceFormat: ICEBERG`): adopt an existing Iceberg table
    * at `root` IN PLACE as a graft table that continues to accept
    * upserts. The latest `metadata/vN.metadata.json` resolves the LIVE
    * file set through the real manifest chain; those files are
    * bootstrap-adopted without rewrite; and the Iceberg metadata
    * lineage CONTINUES — the sync cursor is seeded at (bootstrap
    * instant, last foreign version), so the next [[syncIceberg]]
    * writes v(N+1) over the adopted state and an Iceberg reader walks
    * one unbroken version history across the migration. (Iceberg sync
    * is snapshot-granular, so no reconcile version is needed — the
    * next snapshot simply lists the adopted files.) MOR configs adopt
    * exactly as in [[adoptDelta]]: adopted parquet = base files,
    * upserts append deltas, foreign Iceberg lineage tracks the
    * read-optimized (base-file) view. */
  def adoptIceberg(spark: org.apache.spark.sql.SparkSession, root: String,
      config: graft.core.TableConfig): GraftTable = {
    require(!GraftTable.exists(root), s"$root is already a graft table")
    val metaFile = latestIcebergMetadataFile(root)
    val live = icebergLiveFiles(metaFile)
    require(live.nonEmpty, s"Iceberg table at $root has no live files")
    val lastVer = "^v(\\d+)\\.metadata\\.json$".r
      .findFirstMatchIn(metaFile.getFileName.toString).get.group(1).toLong
    val t = GraftTable.create(spark, root, config)
    t.bootstrapFromFiles(live.map(icebergLocalPath))
    // seed the version counter at the foreign head with an instant
    // BEFORE the bootstrap commit, then sync: v(N+1) describes the
    // adopted (graft-owned, hard-linked) file layout and the cursor
    // lands at (bootstrap instant, N+1) — later upserts continue the
    // same version lineage
    writeCursor(t, "iceberg", "0", lastVer)
    syncIceberg(t)
    t
  }

  /** Read the synced table as a Delta reader would: replayed live file
    * set under the log's schemaString — APPLYING deletion vectors
    * (the add-level roaring bitmaps modern Delta writers attach by
    * default; protocol (3, readerFeatures=[deletionVectors])).
    * Meaningful for COW tables and compacted MOR states (like
    * xTable's read-optimized sync target) — MOR tombstone deltas are
    * data to a format that encodes deletes as file removes.
    * Checkpointed DV logs still refuse ([[checkpointLines]]): this
    * engine's checkpoint schema cannot represent DV'd adds. */
  def readDelta(spark: org.apache.spark.sql.SparkSession,
      root: String): org.apache.spark.sql.DataFrame =
    readDeltaReplay(spark, root,
      replayActions(deltaActionLines(root, Some(spark)), root,
        dvRead = true))

  /** Delta time travel over the export — `VERSION AS OF` semantics: the
    * live set as of log version `asOfVersion`. Versions the checkpoint
    * has subsumed are reconstructable only while their JSON commits
    * still exist: after [[expireDeltaLog]] a pre-checkpoint version is
    * GONE and the read refuses loudly (the same contract real Delta
    * readers apply to retention-cleaned history). */
  def readDelta(spark: org.apache.spark.sql.SparkSession, root: String,
      asOfVersion: Long): org.apache.spark.sql.DataFrame =
    readDeltaReplay(spark, root,
      replayActions(deltaLinesAsOf(spark, root, asOfVersion), root,
        dvRead = true))

  /** The action lines reconstructing table state AS OF `asOfVersion` —
    * the shared assembly behind time travel and the change feed. */
  private def deltaLinesAsOf(spark: org.apache.spark.sql.SparkSession,
      root: String, asOfVersion: Long): Seq[String] = {
    val chain = deltaChain(root)
    require(asOfVersion >= 0 && asOfVersion <= chain.lastVersion,
      s"version $asOfVersion does not exist under $root " +
      s"(head: ${chain.lastVersion})")
    chain.checkpoint match {
      case Some((cpV, _)) if cpV > asOfVersion =>
        // the current checkpoint subsumed this version. A real Delta
        // reader reconstructs it from ANY checkpoint ≤ V plus the
        // contiguous JSONs up to V — superseded checkpoint parquets
        // stay on disk, so consult the newest one ≤ V before falling
        // back to a complete 0..V JSON prefix.
        val logDir = Paths.get(root, "_delta_log")
        val jsons = listJsonVersions(logDir).filter(_._1 <= asOfVersion)
        val sets = checkpointSets(graft.util.Fs.list(logDir)(
          _.map(_.getFileName.toString).toSeq), logDir)
        val seed = sets.keys.filter(_ <= asOfVersion).maxOption
        val floor = seed.getOrElse(-1L)
        val tail = jsons.filter(_._1 > floor)
        require(tail.map(_._1) == (floor + 1).to(asOfVersion),
          s"version $asOfVersion of $root predates the checkpoint and " +
          "its JSON commits were retention-expired with no older " +
          "checkpoint covering them — that history is gone")
        seed.toSeq.flatMap(v => checkpointLines(spark,
          sets(v).getOrElse(1L, sets(v)(sets(v).keys.min)))) ++
          tail.flatMap { case (_, f) =>
            Files.readAllLines(f).asScala.filter(_.nonEmpty)
          }
      case _ =>
        deltaActionLines(root, Some(spark),
          keepJson = v => v <= asOfVersion)
    }
  }

  /** Foreign Delta CHANGE DATA FEED read — the `table_changes` TVF
    * semantics over a foreign `_delta_log`: every row-level change in
    * versions [fromVersion, toVersion] (toVersion = -1 means head),
    * as the data columns plus `_change_type` and `_commit_version`.
    * Per the public protocol: a commit that wrote `cdc` actions is
    * served from EXACTLY its change files (which carry insert /
    * update_preimage / update_postimage / delete rows — the commit's
    * add/remove actions describe the same change and would double
    * count); a commit without them derives changes from its
    * `dataChange=true` actions — adds read as inserts, removes read
    * as deletes from the still-on-disk removed file (a vacuumed file
    * refuses loudly: that history is gone). A DV'd add in a derivation
    * commit is a row-level change the actions alone cannot classify
    * and refuses loudly. Column-mapped tables refuse (their change
    * files spell physical names). This is the incremental-consumption
    * leg of the xTable story — chain a foreign Delta table into
    * table-incremental processing without snapshot diffing.
    * Reference analog: the incremental pipelines the demos build on
    * the native table format's incremental queries. */
  def readDeltaChanges(spark: org.apache.spark.sql.SparkSession,
      root: String, fromVersion: Long,
      toVersion: Long = -1L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.{DataType, StringType, StructType}
    val logDir = Paths.get(root, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $root")
    val jsons = listJsonVersions(logDir)
    require(jsons.nonEmpty, s"no JSON commits under $root/_delta_log")
    val head = deltaChain(root).lastVersion
    val to = if (toVersion < 0L) head else toVersion
    require(fromVersion >= 0L && fromVersion <= to && to <= head,
      s"change range [$fromVersion, $to] is not within [0, $head] " +
      s"of $root")
    val byVer = jsons.filter(j => j._1 >= fromVersion && j._1 <= to).toMap
    val missing = (fromVersion to to).filterNot(byVer.contains)
    require(missing.isEmpty,
      s"versions ${missing.mkString(", ")} of $root have no JSON " +
      "commit files (retention-expired into a checkpoint) — the " +
      "change feed needs the per-commit actions; that history is gone")
    // schema + read envelope from the state as of `to` (protocol and
    // column-mapping checks ride the replay)
    val st = replayActions(deltaLinesAsOf(spark, root, to), root,
      dvRead = true)
    require(columnMappingMode(st) == "none",
      s"Delta table at $root uses column mapping — its change files " +
      "spell physical names this change reader does not remap; read " +
      "snapshots with readDelta or rewrite from the source engine")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val cdcSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_change_type", StringType))
    val perVersion = (fromVersion to to).flatMap { v =>
      val acts = Files.readAllLines(byVer(v)).asScala
        .filter(_.nonEmpty).map(mapper.readTree).toSeq
      def dataChange(n: com.fasterxml.jackson.databind.JsonNode) =
        !jsonPresent(n, "dataChange") || n.get("dataChange").asBoolean()
      def paths(key: String, onlyDataChange: Boolean) = acts
        .filter(a => jsonPresent(a, key))
        .map(_.get(key))
        .filter(n => !onlyDataChange || dataChange(n))
        .map(n => s"$root/${decodeDeltaPath(n.get("path").asText())}")
      val cdc = paths("cdc", onlyDataChange = false)
      if (cdc.nonEmpty)
        // the commit's own change files are the complete, exact record
        Some(spark.read.schema(cdcSchema).parquet(cdc: _*)
          .withColumn("_commit_version", lit(v)))
      else {
        acts.filter(a => jsonPresent(a, "add") && dataChange(a.get("add")))
          .foreach(a => require(
            !jsonPresent(a.get("add"), "deletionVector"),
            s"version $v of $root adds a file with a deletion vector " +
            "and no cdc actions — the actions alone cannot classify " +
            "which rows changed; enable change data feed on the " +
            "source table for this range"))
        val adds = paths("add", onlyDataChange = true)
        val removes = paths("remove", onlyDataChange = true)
        removes.foreach(p => require(
          Files.isRegularFile(Paths.get(p.replaceFirst("^file:/+", "/"))),
          s"version $v of $root removes $p, which no longer exists " +
          "(vacuumed) — its deleted rows cannot be reproduced; that " +
          "history is gone"))
        def tagged(ps: Seq[String], tag: String) =
          if (ps.isEmpty) None
          else Some(spark.read.schema(schema).parquet(ps: _*)
            .withColumn("_change_type", lit(tag))
            .withColumn("_commit_version", lit(v)))
        Seq(tagged(adds, "insert"), tagged(removes, "delete")).flatten
      }
    }
    val outCols = (schema.fieldNames.toSeq :+ "_change_type" :+
      "_commit_version").map(col)
    perVersion
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(cdcSchema.fields :+ org.apache.spark.sql.types
          .StructField("_commit_version", org.apache.spark.sql.types
            .LongType))))
      .select(outCols: _*)
  }

  /** Base live-set read plus deletion-vector application: each DV'd
    * add resolves to its deleted row ordinals ([[DeltaDv]] — framed
    * blob, CRC, portable 64-bit roaring, cardinality all validated)
    * and the scan anti-joins on (file, row ordinal) via Spark's
    * parquet `_metadata` column — the same no-scan-shuffle shape as
    * Iceberg position deletes; AQE broadcasts the usual small delete
    * relation. The decode is driver-side (the bitmaps are
    * metadata-scale by design), loud-capped at 10M total deleted
    * rows — a table past that needs a compaction from the source
    * engine, not a silent driver OOM. */
  private def readDeltaReplay(spark: org.apache.spark.sql.SparkSession,
      root: String, st: DeltaReplay): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    def base() = readDeltaMapped(spark, root, st)
    val dvs: Seq[(String, DeltaDv.Descriptor)] = st.live.toSeq.flatMap {
      case (p, line) =>
        val add = mapper.readTree(line).get("add")
        if (!jsonPresent(add, "deletionVector")) None
        else {
          val d = add.get("deletionVector")
          Seq("storageType", "pathOrInlineDv", "sizeInBytes", "cardinality")
            .foreach(f => require(jsonPresent(d, f),
              s"_delta_log under $root: deletionVector on $p lacks " +
              s"'$f' — a malformed descriptor this reader refuses"))
          Some(p -> DeltaDv.Descriptor(
            d.get("storageType").asText(), d.get("pathOrInlineDv").asText(),
            if (jsonPresent(d, "offset")) Some(d.get("offset").asLong())
            else None,
            d.get("sizeInBytes").asInt(), d.get("cardinality").asLong()))
        }
    }
    if (dvs.isEmpty) return base()
    val totalCard = dvs.map(_._2.cardinality).sum
    require(totalCard <= 10000000L,
      s"_delta_log under $root carries deletion vectors totalling " +
      s"$totalCard deleted rows — beyond this reader's 10M driver " +
      "decode cap; compact the deletes away (OPTIMIZE / purge) from " +
      "the source engine first")
    // descriptor resolution + bitmap decode FIRST: a corrupt or
    // malformed DV must refuse on its own validation, not on whatever
    // the data scan happens to throw first
    val absRoot = java.nio.file.Paths.get(root).toAbsolutePath
    import spark.implicits._
    val dels = dvs.flatMap { case (rel, d) =>
      val fp = absRoot.resolve(rel).toString
      DeltaDv.deletedOrdinals(root, d).map(o => (fp, o))
    }.toDF("__fp", "__pos")
    val b = base()
    val helpers = Seq("__fp", "__pos")
    val clash = b.columns.toSet.intersect(helpers.toSet)
    require(clash.isEmpty,
      s"Delta table at $root has data column(s) ${clash.mkString(", ")} " +
      "that collide with this reader's delete-application helper " +
      "columns — rename them in the source table first")
    val cols = b.columns.toSeq
    b
      .withColumn("__fp",
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(dels, Seq("__fp", "__pos"), "left_anti")
      .select(cols.map(col): _*)
  }

  /** The column-mapping mode of the replayed metaData (`none` when
    * the table never declared one). */
  private def columnMappingMode(st: DeltaReplay): String =
    st.metaDataLine.map { l =>
      val m = mapper.readTree(l).get("metaData")
      val conf = if (m != null && m.has("configuration"))
        m.get("configuration") else null
      if (jsonPresent(conf, "delta.columnMapping.mode"))
        conf.get("delta.columnMapping.mode").asText()
      else "none"
    }.getOrElse("none")

  /** The schema under PHYSICAL names: every field (at every nesting
    * level) renamed to its `delta.columnMapping.physicalName` — what
    * the data files actually spell. Both `name` and `id` modes persist
    * the physical name per the public protocol; a mapped field missing
    * one is a malformed schema this reader refuses (guessing would
    * read the wrong column). */
  private def physicalSchema(logical: org.apache.spark.sql.types.StructType,
      ctx: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val key = "delta.columnMapping.physicalName"
    def remap(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        require(f.metadata.contains(key),
          s"Delta table at $ctx declares column mapping but field " +
          s"'${f.name}' carries no $key — a malformed schema this " +
          "reader refuses rather than reading the wrong column")
        f.copy(name = f.metadata.getString(key), dataType = remap(f.dataType))
      })
      case a: ArrayType => a.copy(elementType = remap(a.elementType))
      case m: MapType =>
        m.copy(keyType = remap(m.keyType), valueType = remap(m.valueType))
      case other => other
    }
    remap(logical).asInstanceOf[StructType]
  }

  /** Live-set read honoring column mapping: `none` reads by logical
    * name directly; `name`/`id` read the parquet under the PHYSICAL
    * schema and cast each top-level column back to its logical type —
    * struct casts rename nested fields positionally, so the result
    * carries logical names at every level. Plan cost: the rename is
    * pure projection metadata; pushdown and pruning operate on the
    * physical scan as usual. */
  private def readDeltaMapped(spark: org.apache.spark.sql.SparkSession,
      root: String, st: DeltaReplay): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DataType, StructType}
    val state = DeltaState(st.schemaJson, st.partCols, st.live.keys.toSeq)
    val mode = columnMappingMode(st)
    if (mode == "none") return readDeltaState(spark, root, state)
    val logical = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val phys = physicalSchema(logical, root)
    if (state.liveFiles.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
    else spark.read.schema(phys)
      .parquet(state.liveFiles.map(p => s"$root/$p"): _*)
      .select(logical.fields.zip(phys.fields).map { case (lf, pf) =>
        col(s"`${pf.name}`").cast(lf.dataType).as(lf.name)
      }.toIndexedSeq: _*)
  }

  private def readDeltaState(spark: org.apache.spark.sql.SparkSession,
      root: String, st: DeltaState): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    if (st.liveFiles.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(st.liveFiles.map(p => s"$root/$p"): _*)
  }

  /** Latest `vN.metadata.json` under an Iceberg table's `metadata/`
    * dir (highest N — the spec's resolution when no catalog pointer
    * exists). */
  def latestIcebergMetadataFile(root: String): java.nio.file.Path = {
    val metaDir = Paths.get(root, "metadata")
    require(Files.isDirectory(metaDir), s"no metadata/ dir under $root")
    val latest = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq).iterator
      .flatMap { n =>
        val m = "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(n)
        m.map(_.group(1).toLong -> n)
      }.toSeq
    require(latest.nonEmpty, s"no v*.metadata.json under $metaDir")
    metaDir.resolve(latest.maxBy(_._1)._2)
  }

  /** Resolve an Iceberg table's LIVE data-file set from a specific
    * `metadata.json`: current snapshot → manifest LIST avro → manifest
    * avro → non-deleted `file_path`s (absolute, per the spec). This is
    * the chain `CALL register_table(metadata_file => ...)` adopts
    * from, and the read side of [[readIceberg]]. */
  /** Read every record of an avro file; LOCATION strings resolve via
    * [[icebergLocalPath]] (bare paths and file: URIs; remote schemes
    * fail loudly there). */
  private def avroRecords(location: String)
      : List[org.apache.avro.generic.GenericRecord] = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val r = new DataFileReader(icebergLocalPath(location).toFile,
      new GenericDatumReader[GenericRecord]())
    try Iterator.continually(r).takeWhile(_.hasNext).map(_.next()).toList
    finally r.close()
  }

  /** One snapshot's resolved file set — Iceberg v2 merge-on-read
    * layout. `data` pairs each live data file with its DATA SEQUENCE
    * NUMBER (entry-level when present, inherited from the manifest
    * list otherwise, 0 for v1 trees that carry none); equality deletes
    * carry their sequence number and `equality_ids` field-id list;
    * `fieldNames` maps the current schema's field ids to column names
    * (the ids are what equality deletes reference). */
  final case class IcebergFileSet(
      data: Seq[(String, Long)],
      positionDeletes: Seq[String],
      equalityDeletes: Seq[(String, Long, Seq[Int])],
      fieldNames: Map[Int, String])

  /** Field-id → column-name map of the CURRENT schema: the v2
    * `schemas` array resolved by `current-schema-id`, falling back to
    * the v1 single `schema` object. Empty when the metadata carries
    * neither (our own minimal emission) — only equality-delete
    * application needs it, and that path refuses loudly on a miss. */
  private def icebergFieldNames(
      meta: com.fasterxml.jackson.databind.JsonNode): Map[Int, String] = {
    val schemaNode =
      if (meta.has("schemas") && meta.get("schemas").isArray) {
        val cur =
          if (meta.has("current-schema-id")) meta.get("current-schema-id").asInt()
          else 0
        meta.get("schemas").elements().asScala
          .find(s => s.has("schema-id") && s.get("schema-id").asInt() == cur)
          .orNull
      } else if (meta.has("schema")) meta.get("schema")
      else null
    if (schemaNode == null || !schemaNode.has("fields")) Map.empty
    else schemaNode.get("fields").elements().asScala
      .filter(f => f.has("id") && f.has("name"))
      .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
  }

  /** Resolve a snapshot's live DATA files, POSITION-DELETE files, and
    * EQUALITY-DELETE files through the manifest chain — Iceberg v2
    * merge-on-read layout: the manifest list carries `content`=0
    * (data) and `content`=1 (delete) manifests; inside a delete
    * manifest, data_file `content`=1 is a position-delete parquet
    * ((file_path, pos) tuples) and `content`=2 an equality-delete
    * parquet (rows of the `equality_ids` columns).
    *
    * Both delete kinds are APPLIED by [[readIceberg]]: position
    * deletes anti-join (file_path, pos); equality deletes anti-join
    * the id columns against data rows from files with STRICTLY SMALLER
    * data sequence numbers (the spec's ordering — a row re-inserted
    * after the delete survives). An equality delete without
    * `equality_ids` or without an orderable sequence number is a
    * malformed tree and refuses loudly — guessing either way
    * resurrects or loses rows silently. Shape violations (a delete
    * file inside a data manifest, a data file inside a delete
    * manifest) refuse loudly too. */
  def icebergLiveFilesEx(metaFile: java.nio.file.Path): IcebergFileSet = {
    val meta = mapper.readTree(Files.readAllBytes(metaFile))
    val snapId = meta.get("current-snapshot-id").asLong()
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalStateException(
        s"current-snapshot-id $snapId not in snapshots"))
    // avro's GenericRecord.get THROWS on a field its schema never
    // declared (v1 trees lack sequence_number/equality_ids entirely) —
    // resolve through the schema so absent-field and null-valued both
    // read as null
    def fieldOf(r: org.apache.avro.generic.GenericRecord,
        name: String): AnyRef =
      if (r.getSchema.getField(name) == null) null else r.get(name)
    def contentOf(r: org.apache.avro.generic.GenericRecord): Int =
      fieldOf(r, "content") match {
        case null => 0
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case other => throw new IllegalStateException(
          s"unreadable Iceberg content field: $other")
      }
    // sequence numbers are absent from v1 trees and from this engine's
    // own minimal emission → 0; entry-level numbers override the
    // manifest's (the spec's inheritance: a null entry sequence number
    // inherits the sequence number the manifest was committed with)
    def seqOf(r: org.apache.avro.generic.GenericRecord,
        inherit: Long): Long = fieldOf(r, "sequence_number") match {
      case null => inherit
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case other => throw new IllegalStateException(
        s"unreadable Iceberg sequence_number field: $other")
    }
    val data = Seq.newBuilder[(String, Long)]
    val posDeletes = Seq.newBuilder[String]
    val eqDeletes = Seq.newBuilder[(String, Long, Seq[Int])]
    for (m <- avroRecords(snap.get("manifest-list").asText())) {
      val mContent = contentOf(m)
      val mSeq = seqOf(m, 0L)
      require(mContent == 0 || mContent == 1,
        s"Iceberg table at $metaFile has a manifest of unknown content=" +
        s"$mContent (${m.get("manifest_path")}) — refusing to guess")
      for {
        e <- avroRecords(m.get("manifest_path").toString)
        if e.get("status").asInstanceOf[Int] != 2 // 2 = DELETED
      } {
        val df = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val fContent = contentOf(df)
        val seq = seqOf(e, mSeq)
        if (mContent == 0) {
          require(fContent == 0,
            s"Iceberg table at $metaFile lists a delete file " +
            s"(content=$fContent, ${df.get("file_path")}) in a data " +
            "manifest — a malformed tree this reader refuses rather " +
            "than resurrecting or dropping rows")
          data += df.get("file_path").toString -> seq
        } else {
          require(fContent != 0,
            s"Iceberg table at $metaFile lists a data file " +
            s"(content=0, ${df.get("file_path")}) inside a DELETE " +
            "manifest — a malformed tree this reader refuses")
          require(fContent == 1 || fContent == 2,
            s"Iceberg table at $metaFile carries a delete file of " +
            s"unknown content=$fContent (${df.get("file_path")}) — " +
            "refusing to guess")
          if (fContent == 1) posDeletes += df.get("file_path").toString
          else {
            val ids = fieldOf(df, "equality_ids") match {
              case null => Nil
              case l: java.util.List[_] =>
                l.asScala.map(_.asInstanceOf[Number].intValue()).toSeq
              case other => throw new IllegalStateException(
                s"unreadable Iceberg equality_ids field: $other")
            }
            require(ids.nonEmpty,
              s"Iceberg table at $metaFile carries an EQUALITY-delete " +
              s"file (${df.get("file_path")}) with no equality_ids — a " +
              "malformed tree; this reader cannot know which columns " +
              "identify the deleted rows")
            require(seq > 0L,
              s"Iceberg table at $metaFile carries an EQUALITY-delete " +
              s"file (${df.get("file_path")}) with no sequence number — " +
              "equality deletes apply only to rows with strictly " +
              "smaller data sequence numbers, so an unordered delete " +
              "cannot be applied soundly")
            eqDeletes += ((df.get("file_path").toString, seq, ids))
          }
        }
      }
    }
    IcebergFileSet(data.result(), posDeletes.result(), eqDeletes.result(),
      icebergFieldNames(meta))
  }

  /** Live data files of a snapshot that carries NO row-level deletes —
    * the ADOPTION/registration contract: a graft bootstrap adopts
    * whole parquet files and has no way to represent a foreign
    * position-delete, so any delete file refuses loudly here.
    * [[readIceberg]] APPLIES position deletes instead — read the data
    * through it, or compact from the source engine before adopting. */
  def icebergLiveFiles(metaFile: java.nio.file.Path): Seq[String] = {
    val fs = icebergLiveFilesEx(metaFile)
    val dels = fs.positionDeletes ++ fs.equalityDeletes.map(_._1)
    require(dels.isEmpty,
      s"Iceberg table at $metaFile has a DELETE manifest with live " +
      s"delete files (${dels.take(3).mkString(", ")}${
        if (dels.size > 3) ", …" else ""}) — adoption/registration " +
      "cannot represent row-level deletes (deleted rows would " +
      "resurrect); read it with readIceberg (which applies them) or " +
      "rewrite the table (rewrite_data_files + " +
      "rewrite_position_delete_files / compact) from the source engine " +
      "first")
    fs.data.map(_._1)
  }

  /** Every METADATA file a `vN.metadata.json` references: each
    * snapshot's manifest-list avro plus the manifest avros that list
    * names. Data files are deliberately NOT collected — expiring them
    * is the table's clean service's job, never the metadata
    * retention's. Missing files (already expired by an earlier pass)
    * are skipped. */
  private def icebergMetadataRefs(metaFile: java.nio.file.Path): Set[java.nio.file.Path] =
    icebergMetadataRefsEx(metaFile)._1

  /** Refs plus whether any referenced manifest-list avro was already
    * missing on disk (an earlier partial expire). The caller must know:
    * a missing list HIDES its manifest avros from this walk, so any of
    * them still on disk would leak permanently once the metadata.json
    * itself is deleted — [[expireIcebergMetadata]] falls back to an
    * orphan sweep when this flag is set. */
  private def icebergMetadataRefsEx(
      metaFile: java.nio.file.Path): (Set[java.nio.file.Path], Boolean) = {
    var missingList = false
    val meta = mapper.readTree(Files.readAllBytes(metaFile))
    // a metadata.json without a snapshots array is a shape this
    // retention pass cannot reason about — fail loudly rather than
    // treating its manifests as unreferenced (which would delete files
    // a kept version still needs) or as absent (which would leak them)
    require(meta.has("snapshots") && meta.get("snapshots").isArray,
      s"$metaFile has no snapshots array — not an Iceberg table metadata " +
      "file this retention pass understands")
    val lists = meta.get("snapshots").elements().asScala
      .map(_.get("manifest-list").asText()).toSeq
    lists.flatMap { l =>
      // LOCATION strings resolve like every other reader in this module
      // (bare path or file: URI; remote schemes fail loudly) — a bare
      // Paths.get would silently miss URI-style locations and leak the
      // very manifest chains this pass exists to delete
      val lp = icebergLocalPath(l)
      if (!Files.exists(lp)) { missingList = true; Seq.empty }
      else lp +: avroRecords(l)
        .map(m => icebergLocalPath(m.get("manifest_path").toString))
    }.toSet -> missingList
  }

  /** Iceberg metadata retention — the [[expireDeltaLog]] twin: keep the
    * newest `keepVersions` `vN.metadata.json` files and delete the
    * older ones plus every manifest-list/manifest avro referenced ONLY
    * by them. Every sync writes a fresh version + manifest chain, so a
    * sync-per-commit export accumulates O(commits) metadata files
    * without this — at one commit a minute that is half a million
    * files a year that every catalog listing walks. Data files are
    * never touched (cleaning superseded data is the table service's
    * job, with its own safety horizon). Returns the deleted paths. */
  def expireIcebergMetadata(root: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, s"keepVersions=$keepVersions — must keep " +
      "at least the latest metadata version")
    val metaDir = Paths.get(root, "metadata")
    require(Files.isDirectory(metaDir), s"no metadata/ dir under $root")
    val versions = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq)
      .flatMap(n => "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(n)
        .map(_.group(1).toLong -> n))
      .sortBy(_._1)
    if (versions.size <= keepVersions) return Nil
    val (drop, keep) = versions.splitAt(versions.size - keepVersions)
    // every membership test below runs on NORMALIZED absolute paths:
    // keepRefs come from metadata-JSON location strings (possibly
    // file: URIs or relative spellings) while the orphan sweep lists
    // the caller-supplied root — raw Path equality across those two
    // producers can miss an equivalent-but-differently-spelled ref and
    // delete a kept snapshot's live manifest avros
    def norm(p: java.nio.file.Path): java.nio.file.Path =
      p.toAbsolutePath.normalize
    val keepEx = keep.map { case (_, n) =>
      icebergMetadataRefsEx(metaDir.resolve(n)) }
    val keepRefs = keepEx.flatMap(_._1).map(norm).toSet
    val deleted = Seq.newBuilder[String]
    var brokenDropChain = false
    drop.foreach { case (_, n) =>
      val mf = metaDir.resolve(n)
      val (refs, missing) = icebergMetadataRefsEx(mf)
      if (missing) brokenDropChain = true
      refs.foreach { p =>
        if (!keepRefs.contains(norm(p)) && Files.exists(p)) {
          Files.delete(p)
          deleted += p.toString
        }
      }
      Files.delete(mf)
      deleted += mf.toString
    }
    // a dropped version whose manifest-list avro is already gone (an
    // earlier partial expire) HIDES its surviving manifest avros from
    // the ref walk — and with the metadata.json now deleted no later
    // run can reach them either, so they would leak permanently. Fall
    // back to an orphan sweep: every .avro under metadata/ not
    // referenced by a kept version is unreachable by definition.
    // Refused (loudly) when a KEPT version's own list is missing —
    // that table is corrupt, and the sweep would delete manifests the
    // kept version's chain nominally still owns.
    if (brokenDropChain) {
      require(!keepEx.exists(_._2),
        s"metadata retention under $root needs an orphan sweep (a dropped " +
        "version's manifest-list is already missing) but a KEPT version's " +
        "manifest-list is missing too — the table metadata is corrupt; " +
        "repair or re-sync before expiring")
      graft.util.Fs.list(metaDir)(
          _.filter(_.getFileName.toString.endsWith(".avro")).toSeq)
        .filterNot(p => keepRefs.contains(norm(p)))
        .foreach { p => Files.delete(p); deleted += p.toString }
    }
    deleted.result()
  }

  /** Iceberg manifests store `file_path` as a LOCATION string that a
    * real engine writes as a URI (`file:/wh/db/t/data/...parquet`,
    * `s3://...`), while this engine's own emission writes bare paths.
    * Resolve either to a local filesystem Path; a non-local scheme is
    * a loud error — there is no object store to read from here. */
  def icebergLocalPath(s: String): java.nio.file.Path = {
    if (s.startsWith("file:")) {
      // tolerate all Hadoop-style spellings: file:/x, file:///x,
      // file://host/x (host ignored for local adoption)
      val rest = s.stripPrefix("file:")
      val path =
        if (rest.startsWith("///")) rest.stripPrefix("//")
        else if (rest.startsWith("//"))
          rest.stripPrefix("//").dropWhile(_ != '/')
        else rest
      Paths.get(path)
    } else if (s.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")) {
      throw new IllegalArgumentException(
        s"Iceberg data file '$s' lives on a non-local scheme — adoption " +
        "in this environment reads the local filesystem only")
    } else Paths.get(s)
  }

  /** Read the synced table as an Iceberg reader would: latest
    * `vN.metadata.json` → current snapshot's manifest list → manifests
    * → data files (absolute paths per the spec) — APPLYING v2 row
    * deletes: position deletes ((file_path, pos) tuples anti-joined on
    * (file, row ordinal)) and equality deletes (the `equality_ids`
    * columns anti-joined against rows with strictly smaller data
    * sequence numbers). */
  def readIceberg(spark: org.apache.spark.sql.SparkSession,
      root: String): org.apache.spark.sql.DataFrame =
    readIcebergMeta(spark, latestIcebergMetadataFile(root))

  private def readIcebergMeta(spark: org.apache.spark.sql.SparkSession,
      metaFile: java.nio.file.Path): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, regexp_replace}
    val fs = icebergLiveFilesEx(metaFile)
    val base = spark.read.parquet(fs.data.map(_._1): _*)
    if (fs.positionDeletes.isEmpty && fs.equalityDeletes.isEmpty) return base
    // the helper columns ride beside the data columns during delete
    // application; a data file that already carries one of these names
    // would be silently clobbered by withColumn — refuse loudly
    val helpers = Seq("__fp", "__pos", "__seq")
    val clash = base.columns.toSet.intersect(helpers.toSet)
    require(clash.isEmpty,
      s"Iceberg table at $metaFile has data column(s) " +
      s"${clash.mkString(", ")} that collide with this reader's " +
      "delete-application helper columns — rename them in the source " +
      "table or compact the deletes away before reading")
    // Path forms are normalized (producers write bare absolute paths
    // or file: URIs; Spark reports file:///…) so equal files compare
    // equal.
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^file:/+", "/")
    def normStr(s: String): String = s.replaceFirst("^file:/+", "/")
    val cols = base.columns.toSeq
    var df = base.withColumn("__fp", norm(col("_metadata.file_path")))
    if (fs.positionDeletes.nonEmpty) {
      // (file_path, pos) application: Spark's parquet _metadata column
      // supplies the row's file and ordinal for free (no shuffle on
      // the scan side); the delete set anti-joins in — AQE broadcasts
      // the usual small delete relation, and a mass-delete set falls
      // back to a shuffled anti-join instead of an OOM.
      val dels = spark.read.parquet(fs.positionDeletes: _*)
        .select(norm(col("file_path")).as("__fp"),
          col("pos").cast("long").as("__pos"))
      df = df.withColumn("__pos", col("_metadata.row_index"))
        .join(dels, Seq("__fp", "__pos"), "left_anti")
    }
    if (fs.equalityDeletes.nonEmpty) {
      // equality application (spec §Scan Planning): a delete row kills
      // data rows whose equality_ids columns ALL match (null matches
      // null — the <=> join keys) AND whose data sequence number is
      // STRICTLY SMALLER than the delete's — a row re-inserted at or
      // after the delete's sequence number survives. The per-row
      // sequence number attaches via a broadcast (file → seq) join on
      // the _metadata file path (metadata-scale relation, never a
      // shuffle of the scan); delete files group by their equality_ids
      // set, one hash anti-join per distinct set, the seq comparison
      // riding as the join's extra condition.
      import spark.implicits._
      val seqDf = fs.data.map { case (p, s) => (normStr(p), s) }
        .toDF("__fp", "__seq")
      df = df.join(broadcast(seqDf), Seq("__fp"))
      fs.equalityDeletes.groupBy(_._3).foreach { case (ids, group) =>
        val delCols = ids.map { id =>
          fs.fieldNames.getOrElse(id, throw new IllegalArgumentException(
            s"Iceberg table at $metaFile has an equality delete over " +
            s"field id $id, which the current schema does not define — " +
            "a malformed tree this reader refuses"))
        }
        val delDf = group.map { case (p, seq, _) =>
          val raw = spark.read.parquet(p)
          delCols.foreach(c => require(raw.columns.contains(c),
            s"equality-delete file $p lacks column '$c' its " +
            "equality_ids promise — a malformed tree this reader refuses"))
          raw.select(delCols.map(col) :+ lit(seq).as("__dseq"): _*)
        }.reduce(_.unionByName(_))
        val cond = delCols.map(c => df(c) <=> delDf(c))
          .reduce(_ && _) && df("__seq") < delDf("__dseq")
        df = df.join(delDf, cond, "left_anti")
      }
    }
    df.select(cols.map(col): _*)
  }

  /** Iceberg time travel over the export — `VERSION AS OF` on the
    * metadata lineage (the [[readDelta(spark*,asOfVersion*]] twin):
    * the live file set as of `vN.metadata.json`. A version whose
    * metadata file [[expireIcebergMetadata]] has dropped is GONE and
    * refuses loudly — the contract real Iceberg readers apply to
    * expired snapshots. */
  def readIceberg(spark: org.apache.spark.sql.SparkSession,
      root: String, version: Long): org.apache.spark.sql.DataFrame = {
    val metaFile = Paths.get(root, "metadata", s"v$version.metadata.json")
    require(Files.exists(metaFile),
      s"no v$version.metadata.json under $root/metadata — that version " +
      "does not exist or its metadata was retention-expired")
    readIcebergMeta(spark, metaFile)
  }

  /** Foreign Iceberg INCREMENTAL read — the [[readDeltaChanges]] twin:
    * every row-level change across metadata versions
    * [fromVersion, toVersion] (toVersion = -1 means head) as the data
    * columns plus `_change_type` and `_commit_version` (the N of
    * `vN.metadata.json`). Each version step classifies from the
    * resolved file-set diff:
    *  - appended data files → `insert` rows;
    *  - NEW position-delete files → the referenced (file, pos) rows
    *    as `delete`, read from the data files (still on disk under
    *    merge-on-read); new data files may ride the same commit — the
    *    MOR upsert shape (postimage inserts + preimage deletes);
    *  - data files REMOVED with none added → their still-live rows as
    *    `delete` (minus positions already deleted in earlier
    *    versions — those were reported then);
    *  - adds and removes in one step with no new delete files is a
    *    rewrite/overwrite/compaction the file diff alone cannot
    *    classify → refused loudly (Iceberg's own incremental scan
    *    makes the same append-only restriction);
    *  - any change in the EQUALITY-delete set → refused (reproducing
    *    those rows needs sequence-ordered reconstruction).
    * Chains a foreign Iceberg table into table-incremental processing
    * without snapshot diffing. */
  def readIcebergChanges(spark: org.apache.spark.sql.SparkSession,
      root: String, fromVersion: Long,
      toVersion: Long = -1L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, regexp_replace}
    val metaDir = Paths.get(root, "metadata")
    require(Files.isDirectory(metaDir), s"no metadata/ dir under $root")
    def metaOf(v: Long) = metaDir.resolve(s"v$v.metadata.json")
    val versions = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq).iterator
      .flatMap("^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(_)
        .map(_.group(1).toLong)).toSeq.sorted
    require(versions.nonEmpty, s"no v*.metadata.json under $metaDir")
    val head = versions.max
    val to = if (toVersion < 0L) head else toVersion
    require(fromVersion >= 1L && fromVersion <= to && to <= head,
      s"change range [$fromVersion, $to] is not within [1, $head] " +
      s"of $root")
    // the step fromVersion needs the state of fromVersion-1; only
    // version 0 (before the first metadata ever written — lineages
    // start at v1) is legitimately empty. A retention-expired v(from-1)
    // must refuse, NOT read as an empty baseline — that would
    // misreport every surviving file as a fresh insert.
    val needed = (fromVersion - 1L).max(1L) to to
    val missing = needed.filterNot(v => Files.exists(metaOf(v)))
    require(missing.isEmpty,
      s"metadata versions ${missing.mkString(", ")} of $root were " +
      "retention-expired — the change feed needs the per-version " +
      "file sets; that history is gone")
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^file:/+", "/")
    def normStr(s: String) = s.replaceFirst("^file:/+", "/")
    val emptySet = IcebergFileSet(Nil, Nil, Nil, Map.empty)
    def fileSet(v: Long): IcebergFileSet =
      if (v == 0L) emptySet else icebergLiveFilesEx(metaOf(v))
    def withMeta(files: Seq[String]) = spark.read.parquet(files: _*)
      .withColumn("__fp", norm(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
    val perVersion = (fromVersion to to).flatMap { v =>
      val prev = fileSet(v - 1)
      val cur = fileSet(v)
      require(prev.equalityDeletes.map(_._1).toSet ==
          cur.equalityDeletes.map(_._1).toSet,
        s"version $v of $root changes the EQUALITY-delete set — " +
        "reproducing those rows needs sequence-ordered reconstruction " +
        "this change reader does not implement; read snapshots with " +
        "readIceberg instead")
      val prevData = prev.data.map(_._1).toSet
      val curData = cur.data.map(_._1).toSet
      val newData = cur.data.map(_._1).filterNot(prevData)
      val goneData = prev.data.map(_._1).filterNot(curData)
      val newPos = cur.positionDeletes.filterNot(prev.positionDeletes.toSet)
      def dataCols(df: org.apache.spark.sql.DataFrame) =
        df.columns.filterNot(Set("__fp", "__pos")).map(col).toIndexedSeq
      def tagged(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.select(dataCols(df): _*)
          .withColumn("_change_type", lit(tag))
          .withColumn("_commit_version", lit(v))
      if (newPos.nonEmpty) {
        require(goneData.isEmpty,
          s"version $v of $root both removes data files and adds " +
          "position-delete files — a shape the file diff cannot " +
          "classify; read snapshots with readIceberg instead")
        val dels = spark.read.parquet(newPos: _*)
          .select(norm(col("file_path")).as("__fp"),
            col("pos").cast("long").as("__pos"))
        // the delete relation names its data files — a metadata-scale
        // distinct; rows come from a pruned read of exactly those
        val refd = dels.select("__fp").distinct()
          .collect().map(_.getString(0)).toSeq
        val known = cur.data.map(p => normStr(p._1)).toSet
        val unknown = refd.filterNot(known)
        require(unknown.isEmpty,
          s"version $v of $root position-deletes from files not in " +
          s"its own snapshot (${unknown.take(3).mkString(", ")}) — a " +
          "malformed tree this reader refuses")
        val deleted = tagged(
          withMeta(refd).join(dels, Seq("__fp", "__pos"), "left_semi"),
          "delete")
        if (newData.isEmpty) Seq(deleted)
        else Seq(tagged(spark.read.parquet(newData: _*), "insert"), deleted)
      } else if (goneData.nonEmpty) {
        require(newData.isEmpty,
          s"version $v of $root both adds and removes data files with " +
          "no new delete files — a rewrite/overwrite/compaction the " +
          "file diff alone cannot classify; read snapshots with " +
          "readIceberg instead")
        goneData.foreach(p => require(
          Files.isRegularFile(Paths.get(normStr(p))),
          s"version $v of $root removes $p, which no longer exists " +
          "(expired/GC'd) — its deleted rows cannot be reproduced; " +
          "that history is gone"))
        // rows already position-deleted in EARLIER versions were
        // reported deleted then — subtract them
        val gone = withMeta(goneData)
        val remaining =
          if (prev.positionDeletes.isEmpty) gone
          else gone.join(
            spark.read.parquet(prev.positionDeletes: _*)
              .select(norm(col("file_path")).as("__fp"),
                col("pos").cast("long").as("__pos")),
            Seq("__fp", "__pos"), "left_anti")
        Seq(tagged(remaining, "delete"))
      } else if (newData.nonEmpty)
        Seq(tagged(spark.read.parquet(newData: _*), "insert"))
      else Nil
    }
    if (perVersion.nonEmpty) perVersion.reduce(_.unionByName(_))
    else {
      // no data changes in range → empty relation under the current
      // snapshot's schema (empty-in-empty-out, like an empty CDC pull)
      val curFiles = fileSet(to).data.map(_._1)
      require(curFiles.nonEmpty,
        s"versions [$fromVersion, $to] of $root carry no data changes " +
        "and the table holds no files to derive a schema from")
      spark.read.parquet(curFiles: _*).limit(0)
        .withColumn("_change_type", lit(null).cast("string"))
        .withColumn("_commit_version", lit(null).cast("long"))
    }
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
