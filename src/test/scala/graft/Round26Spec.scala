package graft

import graft.core.{GraftTable, TableConfig, TableServices}
import graft.interop.XTableSync
import graft.operators.IvfPq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-26 hardening (round-15 verdict + advice):
  *  - foreign row-level deletes REFUSED on the adopt/read legs: Delta
  *    deletion vectors / table-features protocols / column mapping in
  *    `replayActions`, Iceberg v2 delete manifests (content=1) and
  *    delete files (content=2) in `icebergLiveFiles` — both previously
  *    resurrected deleted rows silently;
  *  - multi-part Delta checkpoints are now READ (all parts union
  *    before replay); an incomplete part set named by
  *    `_last_checkpoint` is refused;
  *  - `dedupExact` leaves null-text rows untouched (md5(null) lumped
  *    them into one bogus duplicate group);
  *  - `IvfPq.refreeze` journal crash window closed (the `_appends`
  *    journal travels with the swap; a stale `.old` holding the only
  *    journal copy is never clobbered);
  *  - the curation services compose with MOR plan-scoped compaction
  *    (schedule → dedup_table → execute — the DagSoak interleaving).
  */
class Round26Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r26-$tag-").toString

  // ---- fixture helpers: hand-written foreign _delta_log ---------------

  private val rowSchemaJson =
    Seq((1L, 1L, 0.0)).toDF("id", "ts", "score").schema.json

  private def metaLine(extraConfig: Map[String, String] = Map.empty): String =
    graft.core.CommitLog.mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0",
        "format" -> Map("provider" -> "parquet"),
        "schemaString" -> rowSchemaJson,
        "partitionColumns" -> Seq.empty,
        "configuration" -> extraConfig)))

  private def writeLog(root: String, ver: Long, actions: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(root, "_delta_log"))
    Files.write(Paths.get(root, "_delta_log", f"$ver%020d.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    ()
  }

  private def writeData(root: String, name: String,
      rows: Seq[(Long, Long, Double)]): Long = {
    val tmpd = s"$root/.tmp-${java.util.UUID.randomUUID()}"
    rows.toDF("id", "ts", "score").coalesce(1)
      .write.mode("overwrite").parquet(tmpd)
    val part = graft.util.Fs.list(Paths.get(tmpd))(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
    Files.move(part, Paths.get(root, name))
    graft.util.TempDirs.deleteRecursively(Paths.get(tmpd))
    Files.size(Paths.get(root, name))
  }

  private val protocol12 =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  // ---- replayActions: foreign row-level deletes refused ---------------

  test("adoptDelta/replayDelta refuse a _delta_log carrying " +
      "add.deletionVector — deleted rows must never resurrect; " +
      "readDelta now APPLIES valid DVs (Round28Spec) and refuses a " +
      "MALFORMED descriptor loudly") {
    val root = tmp("dv")
    writeLog(root, 0L, Seq(protocol12, metaLine(),
      """{"add":{"path":"a.parquet","partitionValues":{},"size":10,""" +
        """"modificationTime":1,"dataChange":true,""" +
        """"deletionVector":{"storageType":"u","pathOrInlineDv":"x",""" +
        """"offset":1,"sizeInBytes":40,"cardinality":3}}}"""))
    // 'x' is not a Z85 uuid — the read path validates the descriptor
    // instead of silently resurrecting or mis-deleting rows
    val e = intercept[IllegalArgumentException] {
      XTableSync.readDelta(spark, root) }
    assert(e.getMessage.contains("Z85"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      XTableSync.adoptDelta(spark, root, TableConfig(name = "dv",
        keyField = "id", orderingField = "ts", numBuckets = 1)) }
    assert(e2.getMessage.contains("deletionVector"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      XTableSync.replayDelta(root, spark) }
    assert(e3.getMessage.contains("deletionVector"), e3.getMessage)
  }

  test("readDelta accepts protocol (3, readerFeatures=" +
      "[deletionVectors]) — the one raised envelope it implements — " +
      "and refuses any OTHER reader feature; adoption still refuses " +
      "the raised protocol") {
    val root = tmp("proto")
    writeLog(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      metaLine()))
    // empty live set under the DV protocol reads as an empty relation
    assert(XTableSync.readDelta(spark, root).count() == 0L)
    val eAdopt = intercept[IllegalArgumentException] {
      XTableSync.adoptDelta(spark, root, TableConfig(name = "p",
        keyField = "id", orderingField = "ts", numBuckets = 1)) }
    assert(eAdopt.getMessage.contains("writer"), eAdopt.getMessage)
    val root2 = tmp("proto2")
    writeLog(root2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","timestampNtz"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      metaLine()))
    val e = intercept[IllegalArgumentException] {
      XTableSync.readDelta(spark, root2) }
    assert(e.getMessage.contains("read envelope"), e.getMessage)
  }

  test("replayDelta/adoption refuse delta.columnMapping.mode=name — " +
      "readDelta now REMAPS it (Round28Spec), but a mapped schema " +
      "cannot be represented by name-based replay") {
    val root = tmp("colmap")
    writeLog(root, 0L, Seq(protocol12,
      metaLine(Map("delta.columnMapping.mode" -> "name"))))
    val e = intercept[IllegalArgumentException] {
      XTableSync.replayDelta(root, spark) }
    assert(e.getMessage.contains("columnMapping"), e.getMessage)
    // readDelta under mode=name demands per-field physicalName
    // metadata — this schema has none, so it refuses on the SCHEMA,
    // not the mode
    val e2 = intercept[IllegalArgumentException] {
      XTableSync.readDelta(spark, root) }
    assert(e2.getMessage.contains("physicalName"), e2.getMessage)
  }

  // ---- icebergLiveFiles: v2 delete manifests / delete files refused ---

  private def writeAvro(path: java.nio.file.Path, schemaJson: String,
      rows: Seq[Map[String, Any]]): Unit = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    def rec(s: org.apache.avro.Schema, m: Map[String, Any]): GenericRecord = {
      val r = new GenericData.Record(s)
      m.foreach {
        case (k, sub: Map[_, _]) =>
          r.put(k, rec(s.getField(k).schema(),
            sub.asInstanceOf[Map[String, Any]]))
        case (k, v) => r.put(k, v)
      }
      r
    }
    rows.foreach(m => w.append(rec(schema, m)))
    w.close()
  }

  private val manifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int"}]}""".stripMargin

  private val manifestSchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"content","type":"int"}]}}]}""".stripMargin

  private def icebergFixture(tag: String, listContent: Int,
      fileContent: Int): java.nio.file.Path = {
    val root = tmp(s"ice-$tag")
    val metaDir = Paths.get(root, "metadata")
    Files.createDirectories(metaDir)
    val manifest = metaDir.resolve("m1.avro")
    writeAvro(manifest, manifestSchema, Seq(Map(
      "status" -> Int.box(1),
      "data_file" -> Map("file_path" -> s"$root/data/f1.parquet",
        "content" -> Int.box(fileContent)))))
    val list = metaDir.resolve("snap-1.avro")
    writeAvro(list, manifestListSchema, Seq(Map(
      "manifest_path" -> manifest.toString,
      "content" -> Int.box(listContent))))
    val metaFile = metaDir.resolve("v1.metadata.json")
    Files.writeString(metaFile,
      s"""{"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$list"}]}""".stripMargin)
    metaFile
  }

  test("icebergLiveFiles refuses a DELETE manifest (manifest-list " +
      "content=1) — v2 merge-on-read deletes are not applied here") {
    val e = intercept[IllegalArgumentException] {
      XTableSync.icebergLiveFiles(icebergFixture("delman", 1, 0)) }
    assert(e.getMessage.contains("DELETE manifest"), e.getMessage)
  }

  test("icebergLiveFiles refuses a delete file (data_file content=2) " +
      "inside a data manifest") {
    val e = intercept[IllegalArgumentException] {
      XTableSync.icebergLiveFiles(icebergFixture("delfile", 0, 2)) }
    assert(e.getMessage.contains("delete file"), e.getMessage)
  }

  test("icebergLiveFiles still reads explicit content=0 (v2 data)") {
    val live = XTableSync.icebergLiveFiles(icebergFixture("data", 0, 0))
    assert(live.size == 1 && live.head.endsWith("f1.parquet"))
  }

  // ---- multi-part Delta checkpoint READ --------------------------------

  /** The explicit checkpoint-parquet schema a foreign writer would use
    * (required-field subset; both parts must share ONE schema per the
    * protocol — the reader unions them as a single relation). */
  private def cpSchema: StructType = {
    val pv = MapType(StringType, StringType)
    StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", pv)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", pv),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType))))))
  }

  private def writeCpPart(root: String, ver: Long, part: Int, of: Int,
      lines: Seq[String], schema: StructType = cpSchema): Unit = {
    val tmpd = Paths.get(root, s".cp-${java.util.UUID.randomUUID()}")
    spark.read.schema(schema).json(spark.createDataset(lines))
      .coalesce(1).write.parquet(tmpd.toString)
    val f = graft.util.Fs.list(tmpd)(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
    Files.move(f, Paths.get(root, "_delta_log",
      f"$ver%020d.checkpoint.$part%010d.$of%010d.parquet"))
    graft.util.TempDirs.deleteRecursively(tmpd)
  }

  /** foreign log: v0 adds f0; v1 removes f0, adds f1; checkpoint@1 in
    * TWO parts (protocol+metaData in part 1, tombstone+add in part 2);
    * v0/v1 JSONs retention-expired; v2 adds f2. */
  private def multiPartFixture(): String = {
    val root = tmp("mpcp")
    Files.createDirectories(Paths.get(root, "_delta_log"))
    val s0 = writeData(root, "f0.parquet", Seq((1L, 1L, -1.0)))
    val s1 = writeData(root, "f1.parquet", Seq((1L, 2L, 1.0), (2L, 2L, 2.0)))
    val s2 = writeData(root, "f2.parquet", Seq((3L, 3L, 3.0)))
    writeCpPart(root, 1L, 1, 2, Seq(protocol12, metaLine()))
    writeCpPart(root, 1L, 2, 2, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":2,"dataChange":true}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":2,"dataChange":true}}"""))
    Files.writeString(Paths.get(root, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":4,"parts":2}""")
    writeLog(root, 2L, Seq(
      s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":$s2,"modificationTime":3,"dataChange":true}}"""))
    val _ = s0
    root
  }

  private def state(df: org.apache.spark.sql.DataFrame) = df
    .select("id", "ts", "score").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("multi-part checkpoint: read, VERSION AS OF, and adoption all " +
      "union the parts before replay") {
    val root = multiPartFixture()
    val head = Set((1L, 2L, 1.0), (2L, 2L, 2.0), (3L, 3L, 3.0))
    assert(state(XTableSync.readDelta(spark, root)) == head)
    // VERSION AS OF the checkpointed version itself (JSONs expired)
    assert(state(XTableSync.readDelta(spark, root, 1L)) ==
      Set((1L, 2L, 1.0), (2L, 2L, 2.0)))
    assert(state(XTableSync.readDelta(spark, root, 2L)) == head)
    // adoption bootstraps the same live set and keeps flowing
    val t = XTableSync.adoptDelta(spark, root, TableConfig(
      name = "mpadopt", keyField = "id", orderingField = "ts",
      numBuckets = 1))
    assert(state(t.read()) == head)
    t.upsert(Seq((4L, 4L, 4.0)).toDF("id", "ts", "score"))
    XTableSync.syncDelta(t)
    assert(state(XTableSync.readDelta(spark, root)) == head + ((4L, 4L, 4.0)))
  }

  test("multi-part checkpoint WRITE: checkpointDelta(parts=3) splits " +
      "the reconciled actions, survives log expiry, and round-trips") {
    val root = tmp("mpwrite")
    val t = GraftTable.create(spark, root, TableConfig(
      name = "mpwrite", keyField = "id", orderingField = "ts",
      numBuckets = 1))
    t.insert(Seq((1L, 1L, 1.0), (2L, 1L, 2.0)).toDF("id", "ts", "score"))
    XTableSync.syncDelta(t)
    t.upsert(Seq((2L, 2L, 9.0), (3L, 2L, 3.0)).toDF("id", "ts", "score"))
    XTableSync.syncDelta(t)
    val v = XTableSync.checkpointDelta(spark, root, parts = 3)
    val partNames = graft.util.Fs.list(Paths.get(root, "_delta_log"))(
      _.map(_.getFileName.toString)
        .filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
        .toSeq)
    assert(partNames.size == 3, s"expected 3 parts, got $partNames")
    XTableSync.expireDeltaLog(root)
    val want = state(t.read())
    assert(state(XTableSync.readDelta(spark, root)) == want)
    assert(state(XTableSync.readDelta(spark, root, v)) == want)
    // the export continues on top of the multi-part seed
    t.upsert(Seq((4L, 3L, 4.0)).toDF("id", "ts", "score"))
    XTableSync.syncDelta(t)
    assert(state(XTableSync.readDelta(spark, root)) == want + ((4L, 3L, 4.0)))
  }

  test("multi-part parts with DIFFERENT column subsets still replay " +
      "completely (mergeSchema — one part's footer must never drop " +
      "another part's action class)") {
    val root = tmp("mphetero")
    Files.createDirectories(Paths.get(root, "_delta_log"))
    val s1 = writeData(root, "f1.parquet", Seq((1L, 2L, 1.0), (2L, 2L, 2.0)))
    // part 1 spells ONLY protocol+metaData; part 2 ONLY remove+add —
    // a legal foreign layout (each action in exactly one part)
    val metaOnly = StructType(cpSchema.filter(f =>
      f.name == "protocol" || f.name == "metaData"))
    val fileOnly = StructType(cpSchema.filter(f =>
      f.name == "remove" || f.name == "add"))
    writeCpPart(root, 1L, 1, 2, Seq(protocol12, metaLine()), metaOnly)
    writeCpPart(root, 1L, 2, 2, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":2,"dataChange":true}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":2,"dataChange":true}}"""),
      fileOnly)
    Files.writeString(Paths.get(root, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":4,"parts":2}""")
    assert(state(XTableSync.readDelta(spark, root)) ==
      Set((1L, 2L, 1.0), (2L, 2L, 2.0)))
  }

  test("re-checkpointing the same version in a different shape stays " +
      "readable: _last_checkpoint arbitrates which shape resolves") {
    val root = tmp("reshape")
    val t = GraftTable.create(spark, root, TableConfig(
      name = "reshape", keyField = "id", orderingField = "ts",
      numBuckets = 1))
    t.insert(Seq((1L, 1L, 1.0), (2L, 1L, 2.0)).toDF("id", "ts", "score"))
    XTableSync.syncDelta(t)
    val want = state(t.read())
    XTableSync.checkpointDelta(spark, root) // single-part at v0
    // re-checkpoint the SAME version multi-part: the stale single-part
    // file stays on disk, _last_checkpoint now declares parts=2
    XTableSync.checkpointDelta(spark, root, parts = 2)
    assert(state(XTableSync.readDelta(spark, root)) == want)
    XTableSync.expireDeltaLog(root)
    assert(state(XTableSync.readDelta(spark, root)) == want)
    // and back to single-part: still readable
    XTableSync.checkpointDelta(spark, root)
    assert(state(XTableSync.readDelta(spark, root)) == want)
  }

  test("crash debris at a DIFFERENT part count never invalidates a " +
      "complete set at the same version") {
    val root = multiPartFixture() // complete 2-part set at v1, parts=2
    // a crashed 3-part writer left part 1-of-3 behind
    Files.write(Paths.get(root, "_delta_log",
      f"${1L}%020d.checkpoint.${1}%010d.${3}%010d.parquet"), Array[Byte]())
    val head = Set((1L, 2L, 1.0), (2L, 2L, 2.0), (3L, 3L, 3.0))
    assert(state(XTableSync.readDelta(spark, root)) == head)
  }

  test("writer-only protocol features ((1,4), no readerFeatures) READ " +
      "fine but adoption refuses — continuing the log would violate them") {
    val root = tmp("writeronly")
    val s1 = writeData(root, "f1.parquet", Seq((1L, 1L, 1.0)))
    writeLog(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      metaLine(),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":1,"dataChange":true}}"""))
    assert(state(XTableSync.readDelta(spark, root)) == Set((1L, 1L, 1.0)))
    val e = intercept[IllegalArgumentException] {
      XTableSync.adoptDelta(spark, root, TableConfig(name = "wonly",
        keyField = "id", orderingField = "ts", numBuckets = 1)) }
    assert(e.getMessage.contains("writer"), e.getMessage)
  }

  test("an INCOMPLETE multi-part set named by _last_checkpoint is " +
      "refused loudly") {
    val root = multiPartFixture()
    Files.delete(Paths.get(root, "_delta_log",
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val e = intercept[IllegalArgumentException] {
      XTableSync.readDelta(spark, root) }
    assert(e.getMessage.contains("no complete checkpoint"), e.getMessage)
  }

  // ---- dedupExact: null texts are not duplicates of each other --------

  test("dedupExact leaves null-text rows untouched") {
    val t = GraftTable.create(spark, tmp("nulldedup"), TableConfig(
      name = "nulldedup", keyField = "id", orderingField = "ts",
      numBuckets = 1))
    t.insert(Seq(
      (1L, 1L, Option("aaa")), (2L, 1L, Option("aaa")),
      (3L, 1L, Option.empty[String]), (4L, 1L, Option.empty[String]),
      (5L, 1L, Option("bbb"))).toDF("id", "ts", "text"))
    val n = TableServices.dedupExact(t, "text")
    assert(n == 1L, s"only the aaa duplicate may be deleted, got $n")
    assert(t.read().select("id").as[Long].collect().toSet ==
      Set(1L, 3L, 4L, 5L))
  }

  // ---- refreeze: the journal travels with the swap ---------------------

  test("refreeze never clobbers a stale .old holding the only " +
      "_appends journal (old-layout crash recovery)") {
    val rnd = new scala.util.Random(7)
    val base = (1L to 20L).map(i =>
      (i, Seq.fill(4)(rnd.nextGaussian()))).toDF("id", "embedding")
    val extra = (101L to 110L).map(i =>
      (i, Seq.fill(4)(rnd.nextGaussian()))).toDF("id", "embedding")
    val p = tmp("stalejournal") + "/idx"
    IvfPq.build(base, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = 40, path = p)
    IvfPq.append(extra, "id", "embedding", p, batchId = Some("b1"))
    // simulate the pre-fix crash-between-renames state: the journal
    // exists ONLY under <path>.old
    Files.createDirectories(Paths.get(s"$p.old"))
    Files.move(Paths.get(p, "_appends"), Paths.get(s"$p.old", "_appends"))
    val e = intercept[IllegalArgumentException] { IvfPq.refreeze(spark, p) }
    assert(e.getMessage.contains("_appends journal"), e.getMessage)
    // documented recovery: restore the journal, then refreeze succeeds
    // and the retried batch stays a no-op
    Files.move(Paths.get(s"$p.old", "_appends"), Paths.get(p, "_appends"))
    graft.util.TempDirs.deleteRecursively(Paths.get(s"$p.old"))
    IvfPq.refreeze(spark, p)
    val retry = IvfPq.append(extra, "id", "embedding", p,
      batchId = Some("b1"))
    assert(retry.appended == 0L, "journal lost across refreeze retry")
  }

  // ---- readIceberg VERSION AS OF ---------------------------------------

  test("readIceberg VERSION AS OF replays each synced version; an " +
      "expired version refuses loudly") {
    val root = tmp("iceasof")
    val t = GraftTable.create(spark, root, TableConfig(
      name = "iceasof", keyField = "id", orderingField = "ts",
      numBuckets = 1))
    t.insert(Seq((1L, 1L, 1.0)).toDF("id", "ts", "score"))
    XTableSync.syncIceberg(t) // v0
    t.upsert(Seq((2L, 2L, 2.0)).toDF("id", "ts", "score"))
    XTableSync.syncIceberg(t) // v1
    t.upsert(Seq((3L, 3L, 3.0)).toDF("id", "ts", "score"))
    XTableSync.syncIceberg(t) // v2
    assert(state(XTableSync.readIceberg(spark, root, 0L)) ==
      Set((1L, 1L, 1.0)))
    assert(state(XTableSync.readIceberg(spark, root, 1L)) ==
      Set((1L, 1L, 1.0), (2L, 2L, 2.0)))
    assert(state(XTableSync.readIceberg(spark, root, 2L)) ==
      state(XTableSync.readIceberg(spark, root)))
    XTableSync.expireIcebergMetadata(root, keepVersions = 2)
    val e = intercept[IllegalArgumentException] {
      XTableSync.readIceberg(spark, root, 0L) }
    assert(e.getMessage.contains("retention-expired"), e.getMessage)
    // kept versions still mount after expiry
    assert(state(XTableSync.readIceberg(spark, root, 2L)).size == 3)
  }

  // ---- topKBatch: engine-side chunking + filtered retrieval -----------

  private def annCorpus(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian()))).toDF("id", "embedding")
  }

  test("topKBatch chunks query sets past maxQueries; the union of " +
      "passes equals the unchunked answer (Q = 2.5 x maxQueries)") {
    val corpus = annCorpus(200, 8, 11)
    val p = tmp("chunk") + "/idx"
    val cb = IvfPq.build(corpus, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = 208, path = p)
    val queries = corpus.filter($"id" <= 20)
    def run(mq: Int) = IvfPq.topKBatch(queries, "id", "embedding", p, cb,
        k = 5, nProbe = 2, candidates = 20, maxQueries = mq)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // maxQueries=8 forces ceil(20/8)=3 passes; 100 is one pass
    assert(run(8) == run(100))
  }

  test("topKBatch filter prunes BEFORE ranking: with candidates == k " +
      "every slot is spent on a filter-surviving row") {
    val corpus = annCorpus(100, 8, 13).persist()
    val p = tmp("filt") + "/idx"
    // lossless codebooks + full probe => exact inner-product search
    val cb = IvfPq.build(corpus, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = 108, path = p)
    val allowed = corpus.filter($"id" % 2 === 0).select("id")
    val queries = corpus.filter($"id" === 1L)
    val res = IvfPq.topKBatch(queries, "id", "embedding", p, cb,
        k = 5, nProbe = 2, candidates = 5, // NO over-fetch headroom
        allowed = Some(allowed))
    val got = res.orderBy("rnk").collect().map(_.getLong(1)).toSeq
    // plan-level: the semi join must sit BELOW the candidate-ranking
    // window — filter-then-rank, never rank-then-filter. AQE-aware
    // walk (the Round25Spec flatten): descend through adaptive/stage
    // boundaries, which plain .children does not cross.
    def flatten(n: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: flatten(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: flatten(r.child)
      case other => other +: other.children.flatMap(flatten)
    }
    val plan = flatten(res.queryExecution.executedPlan)
    val windows = plan.filter(_.nodeName.contains("WindowGroupLimit"))
    assert(windows.nonEmpty, "candidate ranking must plan WindowGroupLimit")
    assert(windows.exists(w => flatten(w).exists(n =>
        n.toString.contains("LeftSemi"))),
      "the allowed-id semi join must be a descendant of the ranking window")
    // brute-force filtered top-k, driver-side
    val all = corpus.as[(Long, Seq[Double])].collect()
    val q = all.find(_._1 == 1L).get._2
    val want = all.filter(_._1 % 2 == 0).map { case (id, v) =>
      (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    corpus.unpersist()
    assert(got == want,
      s"a post-ranking filter would return odd-id rows or too few: $got")
  }

  // ---- stored filter columns: build-time metaCols ----------------------

  test("stored filter columns: the predicate pushes into the pruned " +
      "codes scan, appends must carry the column, refreeze keeps it") {
    val rnd = new scala.util.Random(23)
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()), (i % 3).toInt))
      .toDF("id", "embedding", "lang")
    val corpus = mk(1 to 100)
    val p = tmp("stored") + "/idx"
    val cb = IvfPq.build(corpus, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = 160, path = p, metaCols = Seq("lang"))
    val queries = corpus.filter($"id" === 1L).select("id", "embedding")
    val res = IvfPq.topKBatch(queries, "id", "embedding", p, cb,
      k = 5, nProbe = 2, candidates = 5,
      storedFilter = Some(col("lang") === 1))
    val got = res.orderBy("rnk").collect().map(_.getLong(1)).toSeq
    // exact filtered top-k (lossless + full probe + candidates == k
    // only works because the filter ran BEFORE ranking)
    val all = corpus.as[(Long, Seq[Double], Int)].collect()
    val q = all.find(_._1 == 1L).get._2
    val want = all.filter(_._3 == 1).map { case (id, v, _) =>
      (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, sc) => (-sc, id) }.take(5).map(_._1).toSeq
    assert(got == want)
    // plan: the predicate is a parquet PushedFilter on the codes scan
    def flatten(n: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: flatten(a.executedPlan)
      case q2: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q2 +: flatten(q2.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val codeScans = flatten(res.queryExecution.executedPlan).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("pq_codes")) => sc
    }
    assert(codeScans.nonEmpty)
    assert(codeScans.exists(_.metadata.getOrElse("PushedFilters", "")
        .contains("lang")),
      s"lang predicate must reach the codes scan: " +
      codeScans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";"))
    // append without the stored column refuses loudly
    val bare = (200 to 205).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      IvfPq.append(bare, "id", "embedding", p, batchId = Some("bare")) }
    assert(e.getMessage.contains("lang"), e.getMessage)
    // an append CARRYING it lands, and its rows are filterable
    IvfPq.append(mk(200 to 205), "id", "embedding", p,
      batchId = Some("meta"))
    // refreeze preserves the stored column through the rebuild
    IvfPq.refreeze(spark, p)
    val cb2 = IvfPq.codebooks(spark, p)
    val res2 = IvfPq.topKBatch(queries, "id", "embedding", p, cb2,
        k = 3, nProbe = 2, candidates = 106,
        storedFilter = Some(col("lang") === 1))
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    val all2 = all ++ mk(200 to 205).as[(Long, Seq[Double], Int)].collect()
    val want2 = all2.filter(_._3 == 1).map { case (id, v, _) =>
      (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, sc) => (-sc, id) }.take(3).map(_._1).toSeq
    assert(res2 == want2,
      s"stored column must survive append + refreeze: $res2 != $want2")
  }

  test("topKBatchStream serves FILTERED epochs: every epoch's answers " +
      "satisfy the allowed set and equal the filtered batch answer") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
      StructField, StructType}
    val corpus = annCorpus(120, 8, 29).persist()
    val p = tmp("fstream") + "/idx"
    val cb = IvfPq.build(corpus, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = 128, path = p)
    val allowed = corpus.filter($"id" % 2 === 0).select("id")
    val in = tmp("fqin")
    val all = corpus.as[(Long, Seq[Double])].collect()
    java.nio.file.Files.write(Paths.get(in, "q0.json"),
      all.filter(q => Seq(1L, 2L).contains(q._1)).map { case (id, v) =>
        s"""{"id":$id,"embedding":[${v.mkString(",")}]}"""
      }.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val out = tmp("fqout")
    val q = IvfPq.topKBatchStream(
      spark.readStream.schema(schema).json(in),
      "id", "embedding", p, cb, k = 3, nProbe = 2, candidates = 8,
      checkpointDir = tmp("fqckpt"), outPath = out,
      allowed = Some(allowed))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got.forall(_._2 % 2 == 0),
      s"every served neighbor must satisfy the filter: $got")
    val want = IvfPq.topKBatch(corpus.filter($"id" <= 2), "id",
        "embedding", p, cb, k = 3, nProbe = 2, candidates = 8,
        allowed = Some(allowed))
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    corpus.unpersist()
    assert(got == want)
  }

  test("CALL vector_search: missing query_where and unknown filter " +
      "columns refuse loudly; the filter restricts every neighbor") {
    val rnd = new scala.util.Random(37)
    val wh = tmp("vsql-wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(TableConfig(name = "vs2",
      keyField = "vec_id", orderingField = "vec_id", numBuckets = 1))
    t.bulkInsert((1L to 40L).map(i =>
        (i, Seq.fill(4)(rnd.nextGaussian()), (i % 2).toInt))
      .toDF("vec_id", "embedding", "lang"))
    val e = intercept[IllegalArgumentException] {
      gsql.sql("CALL vector_search(table => 'vs2')") }
    assert(e.getMessage.contains("query_where"), e.getMessage)
    intercept[Exception] {
      gsql.sql("CALL vector_search(table => 'vs2', " +
        "query_where => 'vec_id = 1', filter => 'no_such_col = 1')")
        .collect() }
    val rows = gsql.sql("CALL vector_search(table => 'vs2', " +
        "id_col => 'vec_id', vec_col => 'embedding', k => 5, " +
        "n_lists => 2, query_where => 'vec_id <= 2', " +
        "filter => 'lang = 0')")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 % 2 == 0),
      s"every neighbor must satisfy the filter: ${rows.mkString(",")}")
    // a POSITIONAL call must not alias the named-only arguments (the
    // table name in slot 0 would otherwise bind n_lists/query_where)
    val e2 = intercept[IllegalArgumentException] {
      gsql.sql("CALL vector_search('vs2', 'vec_id', 'embedding', 5)") }
    assert(e2.getMessage.contains("query_where"), e2.getMessage)
  }

  test("mmrSelectClustered matches mmrSelect on degenerate rows too: " +
      "a zero vector's NaN score orders identically in both paths") {
    val base = annCorpus(40, 8, 41)
    val corpus = base.unionByName(
      Seq((999L, Seq.fill(8)(0.0))).toDF("id", "embedding"))
    val q = Array.tabulate(8)(i => 0.2 + 0.05 * i)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val exact = rows(graft.operators.Similarity.mmrSelect(
      corpus, "id", "embedding", q, k = 6, lambda = 0.5))
    val clustered = rows(graft.operators.Similarity.mmrSelectClustered(
      corpus, "id", "embedding", q, k = 6, lambda = 0.5,
      numClusters = 1, poolPerCluster = 64))
    assert(clustered == exact,
      s"NaN ordering diverged: $clustered != $exact")
  }

  // ---- mmrSelectClustered: the past-the-envelope MMR ------------------

  test("mmrSelectClustered equals mmrSelect exactly (scores included) " +
      "whenever the pool covers every candidate, any cluster count") {
    val corpus = annCorpus(150, 8, 17)
    val q = Array.tabulate(8)(i => 0.3 + 0.1 * i)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("rank", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    val exact = rows(graft.operators.Similarity.mmrSelect(
      corpus, "id", "embedding", q, k = 10, lambda = 0.5))
    for (clusters <- Seq(1, 4)) {
      val got = rows(graft.operators.Similarity.mmrSelectClustered(
        corpus, "id", "embedding", q, k = 10, lambda = 0.5,
        numClusters = clusters, poolPerCluster = 150))
      assert(got == exact, s"clusters=$clusters diverged from mmrSelect")
    }
  }

  test("mmrSelectClustered reaches k=500 where the guarded greedy " +
      "refuses, and returns 500 distinct ranked picks") {
    val corpus = annCorpus(800, 8, 19)
    val q = Array.fill(8)(0.25)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.mmrSelect(
        corpus, "id", "embedding", q, k = 500) }
    assert(e.getMessage.contains("maxK"))
    val out = graft.operators.Similarity.mmrSelectClustered(
        corpus, "id", "embedding", q, k = 500,
        numClusters = 8, poolPerCluster = 100)
      .select("rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 500)
    assert(out.map(_._1).toSeq == (1L to 500L))
    assert(out.map(_._2).distinct.length == 500)
  }

  // ---- curation services on MOR: plan-scoped compaction interleaved ---

  test("dedupExact victims tombstone correctly on a MOR table with the " +
      "compaction plan bracketing the curation (schedule -> dedup -> run)") {
    val t = GraftTable.create(spark, tmp("mordedup"), TableConfig(
      name = "mordedup", keyField = "id", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 2))
    t.insert(Seq((1L, 1L, "aaa"), (2L, 1L, "bbb"), (3L, 1L, "aaa"))
      .toDF("id", "ts", "text"))
    t.upsert(Seq((4L, 2L, "ccc"), (5L, 2L, "bbb"), (6L, 2L, "aaa"))
      .toDF("id", "ts", "text"))
    val preDedup = t.log.lastInstant().get
    val plan = TableServices.scheduleCompaction(t)
    assert(plan.nonEmpty, "MOR upsert deltas must park a plan")
    // curation lands BETWEEN schedule and execute (the async-suite
    // interleaving): keep-min says 1 (aaa), 2 (bbb), 4 (ccc) survive
    val n = TableServices.dedupExact(t, "text")
    assert(n == 3L, s"aaa x2 + bbb x1 victims expected, got $n")
    plan.foreach(i => TableServices.runCompaction(t, i))
    val ids = t.read().select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L),
      s"post-schedule tombstones must survive the plan-scoped fold: $ids")
    assert(graft.core.Validation.duplicateKeys(t).isEmpty)
    // time travel shows the pre-curation state (timeline semantics)
    assert(t.read(Some(preDedup)).count() == 6L)
    // the table keeps working after the interleaved round
    t.upsert(Seq((7L, 3L, "ddd")).toDF("id", "ts", "text"))
    assert(t.read().select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 7L))
  }

  test("dedupExact races a concurrent writer under OCC: both land " +
      "with retry-on-conflict, no lost commits, no surviving dups") {
    val root = tmp("occdedup")
    val t0 = GraftTable.create(spark, root, TableConfig(
      name = "occdedup", keyField = "id", orderingField = "ts",
      numBuckets = 2))
    t0.insert(Seq(
      (1L, 1L, "aaa"), (2L, 1L, "bbb"), (3L, 1L, "aaa"),
      (4L, 1L, "ccc"), (5L, 1L, "bbb"), (6L, 1L, "aaa"))
      .toDF("id", "ts", "text"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def retrying(tag: String)(op: GraftTable => Unit): Thread =
      new Thread(() => {
        try {
          val t = GraftTable.load(spark, root)
          var done = false
          var tries = 0
          while (!done) {
            try { op(t); done = true }
            catch {
              case _: graft.core.ConcurrentWriteException =>
                tries += 1
                if (tries > 50) throw new IllegalStateException(
                  s"$tag starved after $tries conflicts")
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    val threads = Seq(
      // the curation service is an ordinary OCC writer: a conflicting
      // commit mid-delete surfaces as ConcurrentWriteException and the
      // caller replans from a fresh snapshot, like any writer
      retrying("curation") { t =>
        TableServices.dedupExact(t, "text"); () },
      retrying("writer") { t =>
        t.upsert(Seq((7L, 2L, "ddd"), (8L, 2L, "eee"))
          .toDF("id", "ts", "text")) })
    threads.foreach(_.start())
    threads.foreach(_.join(180000))
    assert(failures.isEmpty, s"failures: ${failures.toArray.mkString("; ")}")
    val t = GraftTable.load(spark, root)
    // keep-min survivors of the planted dups + the writer's new keys —
    // the unique final state whatever order the race resolved in
    assert(t.read().select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 7L, 8L))
    assert(graft.core.Validation.duplicateKeys(t).isEmpty)
  }

  test("dedupFuzzy victims tombstone correctly on a MOR table under " +
      "the same schedule -> dedup -> run interleaving") {
    val t = GraftTable.create(spark, tmp("morfuzzy"), TableConfig(
      name = "morfuzzy", keyField = "id", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 2))
    // near-duplicate pairs share long word runs; singles are unique
    def doc(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    t.insert(Seq(
      (1L, 1L, doc("a") + " tail1"), (2L, 1L, doc("b"))).toDF("id", "ts", "text"))
    t.upsert(Seq(
      (3L, 2L, doc("a") + " tail2"), // near-dup of 1 (shares 30-word run)
      (4L, 2L, doc("c"))).toDF("id", "ts", "text"))
    val plan = TableServices.scheduleCompaction(t)
    assert(plan.nonEmpty)
    val n = TableServices.dedupFuzzy(t, "text", k = 5, numHashes = 64,
      numBands = 16, threshold = 0.5)
    assert(n == 1L, s"exactly the near-dup of doc 1 must go, got $n")
    plan.foreach(i => TableServices.runCompaction(t, i))
    assert(t.read().select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    assert(graft.core.Validation.duplicateKeys(t).isEmpty)
  }
}
