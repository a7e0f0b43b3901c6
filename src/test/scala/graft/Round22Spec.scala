package graft

import graft.core.{GraftTable, TableConfig, TableServices}
import graft.ingest.Debezium
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-22 hardening (advisor findings): clean() vs a file re-added
  * at-or-before the horizon and re-removed after it, Mongo delete
  * tombstones, dotted-path nested partial updates, catalog table-name
  * traversal, 5-byte Confluent frames with empty Avro payloads, and
  * syncViews recovering a user-dropped temp view. */
class Round22Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-r22-").toString

  // ---- clean(): post-horizon re-removal protects the file ------------

  test("clean never deletes a file re-added <= horizon and re-removed > horizon") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "cleanedge", keyField = "id", orderingField = "v",
      numBuckets = 1, smallFileLimitBytes = 0))
    t.insert(Seq((1L, 1L)).toDF("id", "v"))           // c1: adds A
    val c1 = t.log.lastInstant().get
    t.upsert(Seq((1L, 2L)).toDF("id", "v"))           // c2: removes A, adds B
    TableServices.restore(t, c1)                      // c3: re-adds A, removes B
    // c4: the horizon commit — an insert of a DIFFERENT key would land
    // in the same (sole) file group and rewrite A, so append new keys
    // via a second insert commit that doesn't touch A's file: with
    // smallFileLimitBytes=0 inserts always add fresh files
    t.insert(Seq((2L, 1L)).toDF("id", "v"))           // c4
    t.insert(Seq((3L, 1L)).toDF("id", "v"))           // c5
    t.upsert(Seq((1L, 9L)).toDF("id", "v"))           // c6: removes A again
    val commits = t.log.commits()
    assert(commits.size == 6)
    // retain 3 newest => horizon = c4; A's ORIGINAL removal (c2) is
    // <= horizon, its re-add (c3) is <= horizon, its re-removal (c6)
    // is > horizon — snapshots at c4/c5 still reference A
    val horizon = commits(commits.size - 3).instant
    val deleted = TableServices.clean(t, retainCommits = 3)
    val c5 = commits(4).instant
    assert(horizon == commits(3).instant)
    // time travel to a retained snapshot must still read A's row
    assert(t.read(Some(c5)).filter($"id" === 1L).select("v").as[Long].head() == 1L)
    // and cleaning still deletes genuinely dead files (B: removed by
    // the restore, never referenced inside the retained window)
    assert(deleted.nonEmpty, "clean deleted nothing — B should be dead")
  }

  // ---- Mongo: delete tombstones -------------------------------------

  test("Mongo parse tolerates null-value tombstone records after deletes") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("_id", LongType), StructField("v", StringType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "tomb", keyField = "_id", orderingField = "_cdc_ts", numBuckets = 1))
    def js(s: String) = "\"" + s.replace("\"", "\\\"") + "\""
    val create = s"""{"before":null,"after":${js("""{"_id":1,"v":"a"}""")},""" +
      """"updateDescription":null,"op":"c","ts_ms":1}"""
    val del = """{"before":null,"after":null,"updateDescription":null,"op":"d","ts_ms":2}"""
    // connector default tombstones.on.delete=true: the delete is
    // followed by a null-value record on the same key
    val batch = Seq(
      (create, """{"id":"1"}"""),
      (del, """{"id":"1"}"""),
      (null.asInstanceOf[String], """{"id":"1"}""")).toDF("value", "key")
    Debezium.applyMongo(t,
      Debezium.parseMongo(batch, "value", rowSchema, keyJsonCol = Some("key")))
    assert(t.read().count() == 0)
  }

  // ---- Mongo: dotted-path nested partial update ----------------------

  test("Mongo dotted-path update patches a struct column at full-doc parity") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("_id", LongType),
      StructField("name", StringType),
      StructField("address", StructType(Seq(
        StructField("city", StringType), StructField("zip", StringType))))))
    def mk(p: String) = GraftTable.create(spark, s"$work/$p", TableConfig(
      name = p, keyField = "_id", orderingField = "_cdc_ts", numBuckets = 1))
    val dottedT = mk("dotted"); val fullT = mk("fulldoc")
    def js(s: String) = "\"" + s.replace("\"", "\\\"") + "\""
    def env(op: String, ts: Long, after: String, updated: String = null): String = {
      val a = if (after == null) "null" else js(after)
      val ud = if (updated == null) "null"
        else s"""{"updatedFields":${js(updated)},"removedFields":[]}"""
      s"""{"before":null,"after":$a,"updateDescription":$ud,"op":"$op","ts_ms":$ts}"""
    }
    val doc0 = """{"_id":1,"name":"ann","address":{"city":"lyon","zip":"69"}}"""
    // dotted table: create, then $set {"address.city": "nice"} arrives
    // as a dotted updatedFields key (change-stream capture w/o full doc)
    Debezium.applyMongo(dottedT, Debezium.parseMongo(Seq(
      (env("c", 100, doc0), """{"id":"1"}"""),
      (env("u", 101, null, updated = """{"address.city":"nice"}"""), """{"id":"1"}""")
    ).toDF("value", "key"), "value", rowSchema, keyJsonCol = Some("key")))
    // full-doc table: the same logical history with full-document capture
    Debezium.applyMongo(fullT, Debezium.parseMongo(Seq(
      (env("c", 100, doc0), """{"id":"1"}"""),
      (env("u", 101,
        """{"_id":1,"name":"ann","address":{"city":"nice","zip":"69"}}"""),
        """{"id":"1"}""")
    ).toDF("value", "key"), "value", rowSchema, keyJsonCol = Some("key")))
    def state(t: GraftTable) = t.read()
      .select($"_id", $"name", $"address.city", $"address.zip")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(state(dottedT) == Set((1L, "ann", "nice", "69")), state(dottedT).toString)
    assert(state(dottedT) == state(fullT))
  }

  test("upsertPartial merges struct columns subfield-wise") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "structpatch", keyField = "id", orderingField = "ts", numBuckets = 1))
    t.insert(Seq((1L, 1L, "lyon", "69")).toDF("id", "ts", "city", "zip")
      .select($"id", $"ts", struct($"city", $"zip").as("addr")))
    // partial row carries addr.city only (zip null = unset)
    t.upsertPartial(
      Seq((1L, 2L, "nice")).toDF("id", "ts", "city")
        .select($"id", $"ts",
          struct($"city".as("city"), lit(null).cast("string").as("zip")).as("addr")))
    val r = t.read().select($"addr.city", $"addr.zip").collect().head
    assert((r.getString(0), r.getString(1)) == (("nice", "69")))
  }

  // ---- Confluent frame: 5-byte header-only message --------------------

  test("Avro parse accepts a 5-byte Confluent frame with an empty payload") {
    // a record with zero fields encodes to ZERO payload bytes — the
    // frame is exactly the 5-byte header and must not be rejected
    val avsc = """{"type":"record","name":"E","fields":[]}"""
    val frame = Array[Byte](0, 0, 0, 0, 42)
    val row = StructType(Seq(StructField("id", LongType)))
    val parsed = Debezium.parseAvro(
      Seq(frame).toDF("value"), "value", avsc, row, confluentFramed = true)
    // decodes to an empty envelope (all-null fields) without throwing
    assert(parsed.count() == 1)
  }

  // ---- catalog: table-name traversal ---------------------------------

  test("catalog rejects traversal table names centrally") {
    val wh = tmp()
    val cat = new graft.sql.GraftCatalog(spark, wh)
    intercept[IllegalArgumentException] { cat.registerTable("../../x", tmp()) }
    intercept[IllegalArgumentException] { cat.dropTable("../escape") }
    intercept[IllegalArgumentException] {
      cat.createTable(TableConfig(name = "a/b", keyField = "k", orderingField = "o"))
    }
  }

  // ---- image_dims: real PNG/JPEG header parsing -------------------------

  test("image_dims parses real headers and degrades malformed ones to unknown") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def be(v: Int, n: Int): String = ("%0" + (2 * n) + "X").format(v)
    val png = hexBytes("89504E470D0A1A0A0000000D49484452" +
      be(640, 4) + be(480, 4) + "08060000001A2B3C4D")
    // SOF behind a COM segment AND a restart marker (standalone, no len)
    val jpeg = hexBytes("FFD8FFFE0004ABCD" + "FFD0" + "FFC2001108" +
      be(33, 2) + be(77, 2) + "03012200021101031101")
    val cases = Seq(
      (1L, png),
      (2L, jpeg),
      (3L, png.take(10)),                       // truncated: sig only
      (4L, hexBytes("FFD8FFC00003")),           // SOF but dims run off the end
      (5L, hexBytes("FFD8FFFE0001")),           // segment length < 2
      (6L, hexBytes("FFD8FFFE0004ABCD")),       // markers end, no SOF
      (7L, hexBytes("89504E470D0A1A0A0000000D49484452" +
        be(0, 4) + be(480, 4) + "0806000000")), // PNG width 0
      (8L, Array.empty[Byte]))
    val out = cases.toDF("id", "payload")
      .select($"id", graft.functions.GraftExpressions.image_dims($"payload").as("d"))
      .select($"id", $"d.format", $"d.width", $"d.height")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3)))).toMap
    assert(out(1L) == (("png", 640, 480)))
    assert(out(2L) == (("jpeg", 77, 33)))
    (3L to 8L).foreach(i => assert(out(i) == (("unknown", -1, -1)), s"case $i: ${out(i)}"))
  }

  test("audio_meta parses WAV chunk chains and degrades malformed ones") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def le(v: Long, n: Int): String =
      (0 until n).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    val fmt = "666D7420" + le(16, 4) +
      le(1, 2) + le(2, 2) + le(16000, 4) + le(64000, 4) + le(4, 2) + le(16, 2)
    def wav(chunks: String) =
      hexBytes("52494646" + le(4 + chunks.length / 2, 4) + "57415645" + chunks)
    val data = "64617461" + le(8000, 4)
    // odd-size junk chunk (1-byte payload, padded) before fmt
    val odd = "6A756E6B" + le(1, 4) + "AB" + "00"
    val cases = Seq(
      (1L, wav(fmt + data)),                        // plain
      (2L, wav(odd + fmt + data)),                  // padded chunk first
      (3L, wav(fmt)),                               // no data chunk
      (4L, hexBytes("52494646" + le(4, 4) + "57415645")), // no chunks
      (5L, wav(fmt + data).take(10)),               // truncated
      (6L, wav("666D7420" + le(16, 4) + le(1, 2) + le(2, 2) + le(16000, 4) +
        le(0, 4) + le(4, 2) + le(16, 2) + data)))   // zero byteRate
    val out = cases.toDF("id", "payload")
      .select($"id", graft.functions.GraftExpressions.audio_meta($"payload").as("a"))
      .select($"id", $"a.format", $"a.channels", $"a.sample_rate",
        $"a.bits_per_sample", $"a.duration_ms")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(out(1L) == (("wav", 2, 16000, 125L))) // 8000B / 64000Bps = 125ms
    assert(out(2L) == (("wav", 2, 16000, 125L)))
    (3L to 6L).foreach(i =>
      assert(out(i) == (("unknown", -1, -1, -1L)), s"case $i: ${out(i)}"))
  }

  test("audio_meta never throws: huge declared chunk size degrades to unknown") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // a chunk declaring size 0x7FFFFFEF would wrap an Int cursor
    val evil = hexBytes("52494646" + "10000000" + "57415645" +
      "6A756E6B" + "EFFFFF7F")
    val out = Seq((1L, evil)).toDF("id", "payload")
      .select(graft.functions.GraftExpressions.audio_meta($"payload").as("a"))
      .select($"a.format").as[String].head()
    assert(out == "unknown")
  }

  test("catalog: legacy non-\\w+ names stay reachable, new ones are rejected") {
    val wh = tmp()
    val cat = new graft.sql.GraftCatalog(spark, wh)
    // NEW names outside \w+ can no longer be minted (one bad name
    // would break syncViews — and with it every SQL statement)
    intercept[IllegalArgumentException] {
      cat.createTable(TableConfig(
        name = "my-table.v2", keyField = "id", orderingField = "ts"))
    }
    // a LEGACY table created before validation (simulated by an
    // on-disk rename) stays readable and droppable...
    val t = cat.createTable(TableConfig(
      name = "legacyt", keyField = "id", orderingField = "ts", numBuckets = 1))
    t.insert(Seq((1L, 1L)).toDF("id", "ts"))
    Files.move(Paths.get(wh, "legacyt"), Paths.get(wh, "my-table.v2"))
    assert(cat.table("my-table.v2").read().count() == 1)
    // ...and does NOT break SQL for the rest of the catalog
    cat.syncViews()
    cat.dropTable("my-table.v2")
    assert(!cat.tableExists("my-table.v2"))
    intercept[IllegalArgumentException] { cat.dropTable("..") }
    intercept[IllegalArgumentException] { cat.dropTable("a/b") }
  }

  test("icebergLocalPath resolves file: URIs and rejects remote schemes") {
    import graft.interop.XTableSync.icebergLocalPath
    assert(icebergLocalPath("file:/wh/t/data/f.parquet").toString ==
      "/wh/t/data/f.parquet")
    assert(icebergLocalPath("file:///wh/t/f.parquet").toString ==
      "/wh/t/f.parquet")
    assert(icebergLocalPath("/wh/t/f.parquet").toString == "/wh/t/f.parquet")
    intercept[IllegalArgumentException] {
      icebergLocalPath("s3://bucket/t/f.parquet")
    }
  }

  test("delta sync URL-encodes paths per spec; replay round-trips escapeDir dirs") {
    // a partition VALUE with a space: escapeDir writes 'ny%20c' into the
    // directory name, the delta log must carry 'ny%2520c' (spec-encoded)
    // and the replay must land back on the real file
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "enc", keyField = "id", orderingField = "ts",
      partitionField = Some("city"), numBuckets = 1))
    t.insert(Seq((1L, 1L, "ny c"), (2L, 1L, "sf")).toDF("id", "ts", "city"))
    graft.interop.XTableSync.syncDelta(t)
    val log = Files.readString(graft.util.Fs.list(
      Paths.get(t.root, "_delta_log"))(_.toSeq).head)
    assert(log.contains("%2520") || !log.contains("%20"), log.take(500))
    val viaDelta = graft.interop.XTableSync.readDelta(spark, t.root)
      .select("id", "city").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaDelta == Set((1L, "ny c"), (2L, "sf")))
  }

  test("IvfPq.append: batchId idempotence, dim guard, partial-append detection") {
    import graft.operators.IvfPq
    def vec(i: Long): Seq[Double] = Seq((i % 5).toDouble, (i % 7).toDouble)
    val a = (1L to 32L).map(i => (i, vec(i))).toDF("id", "embedding")
    val p = tmp() + "/idx_guard"
    IvfPq.build(a, "id", "embedding", nLists = 2, m = 1, codesPerSub = 4, path = p)
    val b = (101L to 108L).map(i => (i, vec(i))).toDF("id", "embedding")
    val st1 = IvfPq.append(b, "id", "embedding", p, batchId = Some("b1"))
    assert(st1.appended == 8L)
    // same batchId again: skipped, not double-appended
    val st2 = IvfPq.append(b, "id", "embedding", p, batchId = Some("b1"))
    assert(st2.appended == 0L && st2.corpusCount == st1.corpusCount)
    // wrong-dim batch fails loudly before touching the index
    val wrong = Seq((201L, Seq(1.0, 2.0, 3.0))).toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      IvfPq.append(wrong, "id", "embedding", p, batchId = Some("b2"))
    }
    assert(e.getMessage.contains("dim"))
    // a crashed append leaves .inprogress: the next append refuses
    Files.writeString(Paths.get(p, "_appends", "dead.inprogress"), "")
    val e2 = intercept[IllegalArgumentException] {
      IvfPq.append(b, "id", "embedding", p, batchId = Some("b3"))
    }
    assert(e2.getMessage.contains("half-applied"))
  }

  test("video_meta parses MP4 box variants and degrades malformed ones") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def be(v: Long, n: Int): String = ("%0" + (2 * n) + "X").format(v)
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000200"
    def mvhd0(ts: Long, dur: Long): String =
      be(28, 4) + "6D766864" + "00000000" + be(1, 4) + be(2, 4) +
        be(ts, 4) + be(dur, 4)
    // v1: 64-bit creation/modification/duration
    def mvhd1(ts: Long, dur: Long): String =
      be(40, 4) + "6D766864" + "01000000" + be(1, 8) + be(2, 8) +
        be(ts, 4) + be(dur, 8)
    def moov(children: String): String =
      be(8 + children.length / 2, 4) + "6D6F6F76" + children
    // 64-bit-size moov (size field 1 + u64 size)
    def moov64(children: String): String =
      be(1, 4) + "6D6F6F76" + be(16 + children.length / 2, 8) + children
    val cases = Seq(
      (1L, hexBytes(ftyp + moov(mvhd0(600, 1200)))),
      (2L, hexBytes(ftyp + moov(mvhd1(1000, 2500)))),
      (3L, hexBytes(ftyp + be(0, 4) + "6D6F6F76" + mvhd0(600, 900))), // size 0 = to EOF
      (4L, hexBytes(ftyp + moov64(mvhd0(240, 120)))),
      (5L, hexBytes(ftyp + moov(""))),                  // moov without mvhd
      (6L, hexBytes(ftyp + be(4, 4) + "6D6F6F76")),     // box size < 8
      (7L, hexBytes(ftyp).take(10)),                    // truncated
      (8L, hexBytes(ftyp + moov(mvhd0(0, 100)))))       // timescale 0
    val out = cases.toDF("id", "payload")
      .select($"id", graft.functions.GraftExpressions.video_meta($"payload").as("v"))
      .select($"id", $"v.format", $"v.timescale", $"v.duration_ms")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) == (("mp4", 600, 2000L)))
    assert(out(2L) == (("mp4", 1000, 2500L)))
    assert(out(3L) == (("mp4", 600, 1500L)))
    assert(out(4L) == (("mp4", 240, 500L)))
    (5L to 8L).foreach(i =>
      assert(out(i) == (("unknown", -1, -1L)), s"case $i: ${out(i)}"))
  }

  // ---- IvfPq incremental append ---------------------------------------

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    graft.util.Fs.walkSeq(src).foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
    }
  }

  test("IvfPq.append: append-path topK equals rebuild-at-fixed-codebooks topK") {
    import graft.operators.IvfPq
    def vec(i: Long): Seq[Double] =
      Seq((i % 5).toDouble, (i * 3 % 7).toDouble, (i * 7 % 11).toDouble,
        (i * 11 % 13).toDouble)
    val a = (1L to 64L).map(i => (i, vec(i))).toDF("id", "embedding")
    val b = (1001L to 1032L).map(i => (i, vec(i))).toDF("id", "embedding")
    val p1 = tmp() + "/idx_inc"; val p2 = tmp() + "/idx_fixed"
    val cb = IvfPq.build(a, "id", "embedding", nLists = 4, m = 2,
      codesPerSub = 8, path = p1)
    // clone ONLY the frozen quantizer (meta + centroids + codebooks)
    Seq("meta.json", "centroids.parquet", "pq_codebooks.parquet").foreach(f =>
      copyTree(Paths.get(p1, f), Paths.get(p2, f)))
    // rebuild-at-fixed-codebooks: every vector encoded against the clone
    IvfPq.append(a.unionByName(b), "id", "embedding", p2)
    // incremental path: only the new batch appended
    val st = IvfPq.append(b, "id", "embedding", p1)
    assert(st.appended == 32L && st.corpusCount == 96L)
    assert(st.driftRatio > 0, st.toString) // baseline recorded at build
    val q = Array(2.0, 3.0, 5.0, 7.0)
    for (nProbe <- Seq(1, 2, 4)) {
      def res(p: String) = IvfPq.topK(spark, p, cb, q, k = 10, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(res(p1) == res(p2), s"nProbe=$nProbe diverged")
    }
    // appended ids are actually reachable
    val ids = IvfPq.topK(spark, p1, cb, q, k = 96, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ids.exists(_ > 1000L), "no appended vector ever surfaced")
    // drift monitor: a far-shifted batch reports a clear rise
    val far = (2001L to 2032L).map(i =>
      (i, vec(i).map(_ + 100.0))).toDF("id", "embedding")
    val st2 = IvfPq.append(far, "id", "embedding", p1)
    assert(st2.driftRatio > 1.5, s"shifted batch driftRatio=${st2.driftRatio}")
  }

  test("IvfPq.appendStream: micro-batches land exactly-once, queries see them") {
    import graft.operators.IvfPq
    def vec(i: Long): Seq[Double] = Seq((i % 5).toDouble, (i % 7).toDouble)
    val base = (1L to 32L).map(i => (i, vec(i))).toDF("id", "embedding")
    val p = tmp() + "/idx_stream"
    val cb = IvfPq.build(base, "id", "embedding", nLists = 2, m = 1,
      codesPerSub = 4, path = p)
    val in = tmp()
    def writeBatch(name: String, ids: Range): Unit = Files.write(
      Paths.get(in, name),
      ids.map(i => s"""{"id":$i,"embedding":[${vec(i).mkString(",")}]}""")
        .mkString("\n").getBytes("UTF-8"))
    writeBatch("b1.json", 101 to 108)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val q = IvfPq.appendStream(
      spark.readStream.schema(schema).json(in),
      "id", "embedding", p, streamName = "s1", checkpointDir = tmp())
    val queryId = q.id.toString // checkpoint-stable — the idempotence key
    try {
      q.processAllAvailable()
      writeBatch("b2.json", 201 to 204)
      q.processAllAvailable()
    } finally q.stop()
    val ids = IvfPq.topK(spark, p, cb, Array(2.0, 3.0), k = 64, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert((101L to 108L).forall(ids) && (201L to 204L).forall(ids))
    assert(IvfIndexMetaCount(p) == 44L)
    // a replayed epoch is a no-op: re-appending batch 0 under the same
    // (queryId, epoch) key appends nothing
    val replay = IvfPq.append(
      (101L to 108L).map(i => (i, vec(i))).toDF("id", "embedding"),
      "id", "embedding", p, batchId = Some(s"$queryId-0"))
    assert(replay.appended == 0L)
    assert(IvfIndexMetaCount(p) == 44L)
  }

  private def IvfIndexMetaCount(p: String): Long =
    graft.operators.IvfIndex.meta(p).get.corpusCount

  // ---- streaming/ingest hardening (third review pass) ------------------

  test("TableIncrementalSource ignores upstream table-service commits") {
    val work = tmp()
    val up = GraftTable.create(spark, s"$work/up", TableConfig(
      name = "up", keyField = "id", orderingField = "ts", numBuckets = 1))
    val down = GraftTable.create(spark, s"$work/down", TableConfig(
      name = "down", keyField = "id", orderingField = "ts", numBuckets = 1))
    up.insert(Seq((1L, 1L, "a")).toDF("id", "ts", "v"))
    val src = new graft.ingest.TableIncrementalSource(up, s"$work/ckpt")
    assert(graft.ingest.Streamer.runOnce(down, src).isDefined)
    val downCommits = down.log.commits().size
    // an upstream CLEAN advances the timeline with zero new rows: the
    // chained source must report nothing, not publish an empty commit
    (2 to 12).foreach(i => up.upsert(Seq((1L, i.toLong, "a")).toDF("id", "ts", "v")))
    assert(graft.ingest.Streamer.runOnce(down, src).isDefined) // real rows
    graft.core.TableServices.clean(up, retainCommits = 2)
    val afterData = down.log.commits().size
    assert(graft.ingest.Streamer.runOnce(down, src).isEmpty,
      "service-only upstream advancement must not produce a batch")
    assert(down.log.commits().size == afterData)
    assert(downCommits < afterData)
  }

  test("streaming source on a never-written table fails at start, actionably") {
    val root = tmp() + "/empty"
    GraftTable.create(spark, root, TableConfig(
      name = "emptystream", keyField = "id", orderingField = "ts"))
    // the scan (where the guard lives) is built at query START; the
    // failure surfaces either synchronously or as the stream's
    // termination exception — both must carry the actionable message
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-stream").option("path", root)
        .load().writeStream.format("memory").queryName("neverwritten").start()
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("no commits yet")), messages(e).toString)
  }

  test("DirSource checkpoint prunes deleted files; re-created names re-ingest") {
    val in = tmp(); val work = tmp()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", LongType), StructField("v", StringType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "dirsrc", keyField = "id", orderingField = "ts", numBuckets = 1))
    val src = new graft.ingest.JsonDirSource(spark, in, schema, s"$work/ckpt")
    Files.writeString(Paths.get(in, "a.json"), """{"id":1,"ts":1,"v":"x"}""")
    assert(graft.ingest.Streamer.runOnce(t, src).isDefined)
    Files.delete(Paths.get(in, "a.json"))
    Files.writeString(Paths.get(in, "b.json"), """{"id":2,"ts":1,"v":"y"}""")
    assert(graft.ingest.Streamer.runOnce(t, src).isDefined)
    // the checkpoint no longer holds the deleted a.json — a re-created
    // file under the same name is NEW data and must re-ingest
    assert(!Files.readString(Paths.get(s"$work/ckpt")).contains("a.json"))
    Files.writeString(Paths.get(in, "a.json"), """{"id":1,"ts":2,"v":"x2"}""")
    assert(graft.ingest.Streamer.runOnce(t, src).isDefined)
    assert(t.read().filter($"id" === 1L).select("v").as[String].head() == "x2")
  }

  test("validateAgainstInput fails when expected columns are missing from the table") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "valmiss", keyField = "id", orderingField = "ts", numBuckets = 1))
    t.insert(Seq((1L, 1L)).toDF("id", "ts"))
    val expected = Seq((1L, 1L, "x")).toDF("id", "ts", "v")
    assert(!graft.core.Validation.validateAgainstInput(t, expected),
      "a table missing an expected column must not validate")
    assert(graft.core.Validation.validateAgainstInput(t,
      Seq((1L, 1L)).toDF("id", "ts")))
    intercept[IllegalArgumentException] {
      graft.core.Validation.datasetEquals(
        Seq(1L).toDF("a"), Seq(1L).toDF("b"))
    }
  }

  // ---- IncrementalMv / Joins / JdbcSink hardening ----------------------

  test("IncrementalMv: NULL-valued rows keep SQL sum semantics through refreshes") {
    val work = tmp()
    def mk(n: String, key: String, buckets: Int) = GraftTable.create(
      spark, s"$work/$n", TableConfig(name = n, keyField = key,
        orderingField = if (key == "id") "ts" else "_refreshed",
        numBuckets = buckets))
    val base = mk("base", "id", 2)
    val mv = mk("mv", "g", 1)
    base.insert(Seq((1L, 1L, "a", Some(5.0)), (2L, 1L, "b", None))
      .toDF("id", "ts", "g", "value"))
    graft.operators.IncrementalMv.sync(spark, base, mv, "g", "value")
    // group b: one NULL-valued row -> cnt 1, sum NULL
    def state() = mv.read().select("g", "cnt", "sum_value").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getDecimal(2).toPlainString))).toMap
    assert(state()("b") == ((1L, null)))
    // an all-NULL delta batch must not clobber group a's running sum
    base.upsert(Seq((3L, 2L, "a", Option.empty[Double]))
      .toDF("id", "ts", "g", "value"))
    graft.operators.IncrementalMv.sync(spark, base, mv, "g", "value")
    assert(state()("a") == ((2L, "5.00")))
    // a non-null arrival flips group b's sum from NULL to a value
    base.upsert(Seq((4L, 2L, "b", Some(7.0))).toDF("id", "ts", "g", "value"))
    graft.operators.IncrementalMv.sync(spark, base, mv, "g", "value")
    assert(state()("b") == ((2L, "7.00")))
    // maintained == recomputed, NULLs included
    val full = graft.operators.IncrementalMv
      .fullAggregate(base.read(), "g", "value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getDecimal(2).toPlainString))).toMap
    assert(state() == full)
  }

  test("IncrementalMv: a row-less base commit advances the cursor once") {
    val work = tmp()
    val base = GraftTable.create(spark, s"$work/base", TableConfig(
      name = "b2", keyField = "id", orderingField = "ts", numBuckets = 1))
    val mv = GraftTable.create(spark, s"$work/mv", TableConfig(
      name = "m2", keyField = "g", orderingField = "_refreshed", numBuckets = 1))
    base.insert(Seq((1L, 1L, "a", 5.0, "x")).toDF("id", "ts", "g", "value", "tmp"))
    graft.operators.IncrementalMv.sync(spark, base, mv, "g", "value")
    // dropColumn is a ROW-LESS action=commit: the head advances but the
    // CDC range holds zero rows — the cursor must advance anyway, or
    // every later sync re-diffs the same empty range forever
    base.dropColumn("tmp")
    assert(graft.operators.IncrementalMv.sync(spark, base, mv, "g", "value") == 0L)
    val cur1 = graft.operators.IncrementalMv.lastCursor(mv)
    assert(cur1.contains(base.log.lastInstant().get),
      s"cursor $cur1 must cover the row-less head")
    // next sync: a true no-op, no new mv commits
    val mvCommits = mv.log.commits().size
    assert(graft.operators.IncrementalMv.sync(spark, base, mv, "g", "value") == 0L)
    assert(mv.log.commits().size == mvCommits)
    // and the MV content is intact
    assert(mv.read().select("cnt").as[Long].head() == 1L)
  }

  test("asofJoin: NULL right times and NULL keys never match") {
    val left = Seq(("A", 5L), ("B", 5L), (null.asInstanceOf[String], 5L))
      .toDF("sym", "t")
    val right = Seq(("A", Some(10L), 50.0), ("A", None, 99.0),
      ("B", Some(3L), 7.0), (null.asInstanceOf[String], Some(1L), 88.0))
      .toDF("sym", "t", "px")
    val out = graft.operators.Joins
      .asofJoin(left, right, Seq("sym"), "t", Seq("px"))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out(Some("A")) == null,   "NULL-time right row must not match")
    assert(out(Some("B")) == 7.0)
    assert(out(None) == null,        "NULL keys must not pair up")
  }

  test("rangeJoinBinned rejects inverted and bin-exploding ranges loudly") {
    val left = Seq(1.0, 2.0).toDF("v")
    val bad = Seq((10.0, 2.0)).toDF("lo", "hi") // inverted
    val e = intercept[Exception] {
      graft.operators.Joins.rangeJoinBinned(left, "v", bad, "lo", "hi", 1.0)
        .collect()
    }
    assert(e.getMessage.contains("inverted") ||
      Option(e.getCause).exists(_.getMessage.contains("inverted")), e.getMessage)
    val wide = Seq((0.0, 1e9)).toDF("lo", "hi")
    val e2 = intercept[Exception] {
      graft.operators.Joins.rangeJoinBinned(left, "v", wide, "lo", "hi", 0.001)
        .collect()
    }
    assert(e2.getMessage.contains("bins") ||
      Option(e2.getCause).exists(_.getMessage.contains("bins")), e2.getMessage)
    // well-formed ranges still join
    val ok = Seq((0.0, 1.5), (1.5, 3.0)).toDF("lo", "hi")
    assert(graft.operators.Joins
      .rangeJoinBinned(left, "v", ok, "lo", "hi", 1.0).count() == 2)
  }

  test("parseTopic2TableMap rejects empty topics and duplicate routes") {
    import graft.ingest.JdbcSink.parseTopic2TableMap
    assert(parseTopic2TableMap("a=t1,b=t2") == Map("a" -> "t1", "b" -> "t2"))
    intercept[IllegalArgumentException] { parseTopic2TableMap("=t1,b=t2") }
    intercept[IllegalArgumentException] { parseTopic2TableMap("a=t1,a=t2") }
  }

  // ---- GraftBloom: independent-seed probes, tiny-fpp soundness --------

  test("bloomDecontaminate at fpp=1e-9 equals the exact operator on the fixture") {
    // regression: Spark's sketch BloomFilter (double-hashed probes)
    // false-positived doc 423 of this exact fixture at fpp=1e-9 —
    // a ~1e-5 per-item FP floor no requested fpp could lower. The
    // independently-seeded GraftBloom must match the exact pass.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    import org.apache.spark.sql.functions.col
    val exact = graft.operators.Curation.decontaminate(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
        "doc_id", "text", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sketch = graft.operators.Curation.bloomDecontaminate(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
        "doc_id", "text", k = 5, fpp = 1e-9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sketch == exact,
      s"diverged: sketch-only=${sketch -- exact}, exact-only=${exact -- sketch}")
    assert(sketch.contains(423L), "the historical FP victim must be kept")
  }

  test("GraftBloom has no false negatives and honest sizing") {
    val b = {
      import spark.implicits._
      val hashes = (1L to 10000L).map(_ * 2654435761L).toDF("h")
      graft.functions.GraftBloom.build(hashes, "h", 10000L, 0.001)
    }
    (1L to 10000L).foreach(i => assert(b.mightContain(i * 2654435761L)))
    // FP sample on disjoint probes: ~0.001 expected, allow 10x
    val fps = (1L to 20000L).map(i => i * 7L + 3L)
      .count(h => b.mightContain(h))
    assert(fps <= 200, s"fp count $fps way above the 0.001 target")
  }

  // ---- adoptDelta: in-place adoption continues the _delta_log ---------

  test("adoptDelta: live-set adoption, continued log, upserts keep flowing") {
    val root = tmp() + "/dsrc"
    Files.createDirectories(Paths.get(root, "_delta_log"))
    def writeFile(name: String, rows: Seq[(Long, Long, Double)]): Long = {
      val tmpd = s"$root/.tmp"
      rows.toDF("id", "ts", "score").coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = graft.util.Fs.list(Paths.get(tmpd))(_
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
      Files.move(part, Paths.get(root, name))
      graft.util.TempDirs.deleteRecursively(Paths.get(tmpd))
      Files.size(Paths.get(root, name))
    }
    val schema = Seq((1L, 1L, 0.0)).toDF("id", "ts", "score").schema.json
    val meta = graft.core.CommitLog.mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0", "format" -> Map("provider" -> "parquet"),
        "schemaString" -> schema, "partitionColumns" -> Seq.empty)))
    val s0 = writeFile("old.parquet", Seq((1L, 1L, -1.0)))
    val s1 = writeFile("a.parquet", Seq((1L, 2L, 1.0), (2L, 2L, 2.0)))
    def w(ver: Long, actions: Seq[String]): Unit = Files.write(
      Paths.get(root, "_delta_log", f"$ver%020d.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    w(0L, Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
      s"""{"add":{"path":"old.parquet","partitionValues":{},"size":$s0,"modificationTime":1,"dataChange":true}}"""))
    w(1L, Seq(
      """{"remove":{"path":"old.parquet","dataChange":true,"deletionTimestamp":2}}""",
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$s1,"modificationTime":2,"dataChange":true}}"""))

    val t = graft.interop.XTableSync.adoptDelta(spark, root,
      graft.core.TableConfig(name = "adopted", keyField = "id",
        orderingField = "ts", numBuckets = 1))
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "ts", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // adoption resolved the LIVE set (old.parquet still on disk, excluded)
    assert(state(t.read()) == Set((1L, 2L, 1.0), (2L, 2L, 2.0)))
    // the _delta_log continued: full-log replay == graft snapshot
    assert(state(graft.interop.XTableSync.readDelta(spark, root)) == state(t.read()))
    // post-adoption upsert flows into BOTH views after an incremental sync
    t.upsert(Seq((2L, 3L, 9.0), (3L, 3L, 3.0)).toDF("id", "ts", "score"))
    graft.interop.XTableSync.syncDelta(t)
    val expect = Set((1L, 2L, 1.0), (2L, 3L, 9.0), (3L, 3L, 3.0))
    assert(state(t.read()) == expect)
    assert(state(graft.interop.XTableSync.readDelta(spark, root)) == expect)
    // full triangle: re-export Iceberg over the adopted table
    graft.interop.XTableSync.syncIceberg(t)
    assert(state(graft.interop.XTableSync.readIceberg(spark, root)) == expect)
  }

  // ---- adoptIceberg: in-place adoption continues the metadata lineage --

  test("adoptIceberg: live-set adoption, continued versions, upserts keep flowing") {
    val root = tmp() + "/isrc"
    // produce a REAL Iceberg table: graft writes + sync, then the graft
    // commit log is deleted — what's left is only the Iceberg metadata
    // chain and the parquet it references (a genuinely foreign table
    // with a superseded v0 still on disk)
    locally {
      val t0 = GraftTable.create(spark, root, TableConfig(
        name = "ice0", keyField = "id", orderingField = "ts", numBuckets = 1))
      t0.insert(Seq((1L, 1L, 1.0), (2L, 1L, 2.0)).toDF("id", "ts", "score"))
      graft.interop.XTableSync.syncIceberg(t0) // v0 — superseded
      t0.upsert(Seq((2L, 2L, 9.0), (3L, 2L, 3.0)).toDF("id", "ts", "score"))
      graft.interop.XTableSync.syncIceberg(t0) // v1 — current
      graft.util.Fs.walkSeq(Paths.get(root, graft.core.CommitLog.Dir))
        .reverse.foreach(Files.deleteIfExists(_))
    }
    assert(!GraftTable.exists(root))
    val t = graft.interop.XTableSync.adoptIceberg(spark, root,
      TableConfig(name = "iceadopt", keyField = "id", orderingField = "ts",
        numBuckets = 1))
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "ts", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val adopted = Set((1L, 1L, 1.0), (2L, 2L, 9.0), (3L, 2L, 3.0))
    assert(state(t.read()) == adopted)
    // the metadata lineage continued: v2 now describes the adopted
    // layout and an Iceberg reader sees the same rows
    assert(graft.interop.XTableSync
      .latestIcebergMetadataFile(root).getFileName.toString == "v2.metadata.json")
    assert(state(graft.interop.XTableSync.readIceberg(spark, root)) == adopted)
    // post-adoption upsert flows through the next incremental sync
    t.upsert(Seq((3L, 3L, 7.0), (4L, 3L, 4.0)).toDF("id", "ts", "score"))
    graft.interop.XTableSync.syncIceberg(t)
    val expect = Set((1L, 1L, 1.0), (2L, 2L, 9.0), (3L, 3L, 7.0), (4L, 3L, 4.0))
    assert(state(t.read()) == expect)
    assert(state(graft.interop.XTableSync.readIceberg(spark, root)) == expect)
  }

  // ---- domainCap: salted two-stage top-N is exact ---------------------

  test("domainCap two-stage salted top-N equals the single-window result") {
    import org.apache.spark.sql.expressions.Window
    // planted skew: 85% of docs on one mega-domain, score ties included
    val docs = (1L to 2000L).map { i =>
      val d = if (i % 100 < 85) "mega" else s"d${i % 7}"
      (i, s"http://$d.com/p$i", (i % 13).toDouble)
    }.toDF("id", "url", "score")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("domain", "id", "domain_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = key(graft.operators.Curation
      .canonicalizeUrls(docs, "url")
      .withColumn("domain_rank", row_number().over(
        Window.partitionBy($"domain").orderBy($"score".desc, $"id".asc))
        .cast("long"))
      .filter($"domain_rank" <= 5))
    for (s <- Seq(1, 3, 64)) {
      val staged = key(graft.operators.Curation
        .domainCap(docs, "url", "id", "score", maxPerDomain = 5, salts = s))
      assert(staged == direct, s"salts=$s diverged")
    }
    // cap larger than every domain: nothing dropped, ranks still dense
    val all = graft.operators.Curation
      .domainCap(docs, "url", "id", "score", maxPerDomain = 10000, salts = 8)
    assert(all.count() == 2000)
  }

  // ---- syncViews: user-dropped temp view recovers ---------------------

  test("syncViews re-registers a view the user dropped without a timeline advance") {
    val wh = tmp()
    val cat = new graft.sql.GraftCatalog(spark, wh)
    val t = cat.createTable(TableConfig(
      name = "sv", keyField = "id", orderingField = "v", numBuckets = 1))
    t.insert(Seq((1L, 1L)).toDF("id", "v"))
    cat.syncViews()
    assert(spark.sql("SELECT count(*) FROM sv").as[Long].head() == 1L)
    spark.catalog.dropTempView("sv") // user drops it out from under the cache
    cat.syncViews()                  // timeline unchanged — must still re-register
    assert(spark.sql("SELECT count(*) FROM sv").as[Long].head() == 1L)
    cat.dropTable("sv")
  }
}
