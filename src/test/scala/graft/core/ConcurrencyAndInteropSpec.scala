package graft.core

import graft.Session
import graft.interop.XTableSync
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** T4 multi-writer OCC + T6 xTable metadata emission. */
class ConcurrencyAndInteropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-cc-").toString

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = Some("date"), numBuckets = 2)

  private def rows(kv: (String, String, Long)*) =
    kv.map { case (k, ts, v) => (k, "S", ts, "2018/08/31", v) }
      .toDF("key", "symbol", "ts", "date", "volume")

  test("OCC: stale-snapshot rewrite of the same file group is rejected") {
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("occ"))
    t.insert(rows(("A", "t1", 1L)))
    val planning = t.log.lastInstant().get
    // another writer lands an upsert into A's group after `planning`
    t.upsert(rows(("A", "t2", 2L)))
    // a writer that planned at `planning` and rebuilt A's group must fail
    val groups = t.log.liveFiles().map(f => (f.partition, f.bucket)).toSet
    val c = Commit(t.log.nextInstant(), "commit", "upsert",
      removed = Nil, schemaJson = t.schema.json)
    intercept[ConcurrentWriteException] {
      t.commitValidated(c, planning, groups)
    }
    // and a non-overlapping writer commits fine
    assert(t.commitValidated(
      Commit(t.log.nextInstant(), "commit", "upsert", schemaJson = t.schema.json),
      planning, Set(("2099/01/01", 0))).nonEmpty)
  }

  test("OCC: concurrent removal of the same files is rejected; lock serializes") {
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("occ2"))
    t.insert(rows(("A", "t1", 1L), ("B", "t1", 1L)))
    val planning = t.log.lastInstant().get
    val victims = t.log.liveFiles().map(_.path)
    t.upsert(rows(("A", "t2", 2L))) // rewrites A's group (removes its file)
    val conflict = Commit(t.log.nextInstant(), "replace", "cluster",
      removed = victims, schemaJson = t.schema.json)
    intercept[ConcurrentWriteException] {
      t.commitValidated(conflict, planning, Set.empty)
    }
    // sequential writers through the public API never conflict
    t.upsert(rows(("B", "t2", 3L)))
    assert(t.read().count() == 2)
  }

  test("OCC: genuinely concurrent writers all land with retry-on-conflict") {
    val root = tmp()
    GraftTable.create(spark, root, cfg("occ3"))
    // 3 writers × 2 upserts each, distinct key spaces, shared buckets;
    // ConcurrentWriteException → replan from a fresh snapshot (the
    // reference's multi-writer retry contract)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 3).map { w =>
      new Thread(() => {
        try {
          val t = GraftTable.load(spark, root)
          (0 until 2).foreach { i =>
            var done = false
            var tries = 0
            while (!done) {
              try {
                t.upsert(rows((s"k$w", s"t$i", (w * 10 + i).toLong)))
                done = true
              } catch {
                case _: ConcurrentWriteException =>
                  tries += 1
                  if (tries > 50) throw new IllegalStateException(
                    s"writer $w batch $i starved after $tries conflicts")
              }
            }
          }
        } catch {
          case e: Throwable => failures.add(e)
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000))
    assert(failures.isEmpty, s"writer failures: ${failures.toArray.mkString("; ")}")
    val t = GraftTable.load(spark, root)
    val state = t.read().select("key", "volume").as[(String, Long)].collect().toMap
    assert(state == Map("k0" -> 1L, "k1" -> 11L, "k2" -> 21L))
    assert(t.read().groupBy("key").count().filter($"count" > 1).count() == 0)
  }

  test("OCC: 4-writer mixed-op matrix (upsert/upsert/delete/cluster) — no lost commits") {
    // mirrors the reference's multi-writer-{1..4}.properties run: four
    // genuinely concurrent writers with DIFFERENT operation kinds, all
    // retrying on ConcurrentWriteException from a fresh snapshot
    val root = tmp()
    val t0 = GraftTable.create(spark, root, cfg("occ4"))
    // w2's victims pre-exist so its deletes race the other writers
    t0.insert(rows(("d0", "t0", 1L), ("d1", "t0", 1L), ("d2", "t0", 1L)))
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
              case _: ConcurrentWriteException =>
                tries += 1
                if (tries > 50) throw new IllegalStateException(
                  s"$tag starved after $tries conflicts")
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    val threads = Seq(
      retrying("w0-upserts") { t =>
        (0 until 3).foreach(i => t.upsert(rows((s"a", s"t$i", i.toLong)))) },
      retrying("w1-upserts") { t =>
        (0 until 3).foreach(i => t.upsert(rows((s"b", s"t$i", (10 + i).toLong)))) },
      retrying("w2-deletes") { t =>
        t.deleteWhere(col("key").isin("d0", "d2")) },
      retrying("w3-cluster") { t =>
        TableServices.cluster(t); () })
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(failures.isEmpty, s"writer failures: ${failures.toArray.mkString("; ")}")
    val t = GraftTable.load(spark, root)
    // zero lost commits: every writer's LAST write is visible
    val state = t.read().select("key", "volume").as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 2L, "b" -> 12L, "d1" -> 1L))
    // timeline linearizable: instants strictly increasing and unique,
    // and every operation kind that must have landed is on the timeline
    val commits = t.log.commits()
    val instants = commits.map(_.instant)
    assert(instants == instants.sorted && instants.distinct == instants)
    val ops = commits.map(_.operation)
    assert(ops.count(_ == "upsert") >= 6) // 3 per upsert writer, none lost
    assert(ops.contains("delete"))
    assert(ops.contains("cluster"))
  }

  test("concurrent streaming writers on disjoint keys commit conflict-free") {
    import graft.sql.GraftStreamingWrite
    val root = tmp()
    def c(n: String) = TableConfig(
      name = n, keyField = "k", orderingField = "ts", numBuckets = 2)
    val srcA = GraftTable.create(spark, s"$root/srcA", c("cs_srcA"))
    val srcB = GraftTable.create(spark, s"$root/srcB", c("cs_srcB"))
    // MOR target: streaming upserts append delta files, so two live
    // writers are conflict-free BY CONSTRUCTION — and every commit
    // still goes through the fenced lock + validation (T4)
    val dst = GraftTable.create(spark, s"$root/dst",
      c("cs_dst").copy(tableType = TableConfig.Mor))
    srcA.insert(Seq(("a1", 1L, 10.0), ("a2", 1L, 20.0)).toDF("k", "ts", "v"))
    srcB.insert(Seq(("b1", 1L, 30.0), ("b2", 1L, 40.0)).toDF("k", "ts", "v"))
    def replicate(src: String, ck: String) =
      spark.readStream.format("graft-stream").option("path", src).load()
        .select("k", "ts", "v")
        .writeStream.outputMode("append").format("graft-stream")
        .option("path", s"$root/dst")
        .option("checkpointLocation", ck).start()
    val qA = replicate(s"$root/srcA", s"$root/ckA")
    val qB = replicate(s"$root/srcB", s"$root/ckB")
    try {
      // both writers land their initial epoch, then a second wave on
      // each source while BOTH queries stay live against one table
      qA.processAllAvailable(); qB.processAllAvailable()
      srcA.upsert(Seq(("a1", 2L, 11.0), ("a3", 1L, 50.0)).toDF("k", "ts", "v"))
      srcB.upsert(Seq(("b2", 2L, 41.0), ("b3", 1L, 60.0)).toDF("k", "ts", "v"))
      qA.processAllAvailable(); qB.processAllAvailable()
      // neither query died on a write conflict
      assert(qA.exception.isEmpty && qB.exception.isEmpty)
      // converged state = latest-wins union of both key spaces
      val got = dst.read().select("k", "ts", "v")
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == Seq(("a1", 2L, 11.0), ("a2", 1L, 20.0),
        ("a3", 1L, 50.0), ("b1", 1L, 30.0), ("b2", 2L, 41.0),
        ("b3", 1L, 60.0)))
      // serializable timeline: instants strictly increase and are
      // unique even with two writers interleaving
      val instants = dst.log.commits().map(_.instant)
      assert(instants == instants.sorted && instants.distinct == instants)
      // both writers' commits are present and each writer's epoch
      // stamps are monotone on the shared timeline
      val byQuery = dst.log.commits()
        .flatMap(c => c.extra.get(GraftStreamingWrite.QueryIdKey)
          .map(q => q -> c.extra(GraftStreamingWrite.EpochKey).toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(byQuery.size == 2)
      byQuery.values.foreach(es => assert(es == es.sorted.distinct))
    } finally { qA.stop(); qB.stop() }
  }

  test("xTable Delta sync: protocol+metaData then add/remove per commit, incremental") {
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("xt"))
    t.insert(rows(("A", "t1", 1L)))
    val v1 = XTableSync.syncDelta(t)
    assert(v1 == Seq(0L))
    val log0 = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${0L}%020d.json")).asScala.mkString("\n")
    assert(log0.contains("\"protocol\""))
    assert(log0.contains("\"metaData\""))
    assert(log0.contains("\"add\""))
    assert(log0.contains("\"schemaString\""))
    // second commit → one more delta version with add+remove
    t.upsert(rows(("A", "t2", 2L)))
    val v2 = XTableSync.syncDelta(t)
    assert(v2 == Seq(1L))
    val log1 = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${1L}%020d.json")).asScala.mkString("\n")
    assert(log1.contains("\"add\"") && log1.contains("\"remove\""))
    // caught up → no-op
    assert(XTableSync.syncDelta(t).isEmpty)
    // every referenced file exists on disk — log paths are URL-encoded
    // per the Delta protocol, so decode like a Delta reader would
    val added = "\"path\":\"([^\"]+)\"".r.findAllMatchIn(log0 + log1)
      .map(m => java.net.URLDecoder.decode(
        m.group(1).replace("+", "%2B"), "UTF-8")).toSeq
    added.foreach(p => assert(Files.exists(Paths.get(root, p)), p))
  }

  test("xTable Iceberg sync: v2 metadata + manifest, incremental versions") {
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("xti"))
    t.insert(rows(("A", "t1", 1L)))
    assert(XTableSync.syncIceberg(t) == Some(0L))
    val meta = new String(Files.readAllBytes(
      Paths.get(root, "metadata", "v0.metadata.json")), "UTF-8")
    assert(meta.contains("\"format-version\":2"))
    assert(meta.contains("\"current-snapshot-id\""))
    assert(meta.contains("\"partition-specs\""))
    assert(XTableSync.syncIceberg(t).isEmpty) // caught up
    t.insert(rows(("B", "t1", 2L)))
    assert(XTableSync.syncIceberg(t) == Some(1L))
  }

  test("external-reader readback: Delta log replay reproduces every synced snapshot") {
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("xtrb"))
    def viaDelta = XTableSync.readDelta(spark, root)
      .select("key", "date", "volume").as[(String, String, Long)].collect().toSet
    def viaApi = t.read()
      .select("key", "date", "volume").as[(String, String, Long)].collect().toSet

    // insert → sync → a pure log consumer sees the snapshot
    t.insert(rows(("A", "t1", 1L), ("B", "t1", 2L)))
    XTableSync.syncDelta(t)
    assert(viaDelta == viaApi && viaDelta.map(_._1) == Set("A", "B"))

    // upsert (file-group rewrite → add+remove) → incremental sync
    t.upsert(rows(("A", "t2", 9L)))
    XTableSync.syncDelta(t)
    assert(viaDelta == viaApi)
    assert(viaDelta.find(_._1 == "A").get._3 == 9L)

    // hard delete (COW rewrite) → the removed rows vanish for the
    // external reader too — no tombstones leak as data
    t.deleteWhere(col("key") === "B")
    XTableSync.syncDelta(t)
    assert(viaDelta == viaApi && viaDelta.map(_._1) == Set("A"))

    // replayed metadata matches the engine's: schema + partition cols
    val st = XTableSync.replayDelta(root)
    assert(st.partitionColumns == Seq("date"))
    assert(org.apache.spark.sql.types.DataType.fromJson(st.schemaJson) == t.schema)
    // row-level parity, not just key sets: no duplicate or ghost rows
    assert(XTableSync.readDelta(spark, root).count() == t.read().count())
  }

  test("external-reader readback: Iceberg metadata chain reproduces the snapshot") {
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("xtrbi"))
    t.insert(rows(("A", "t1", 1L), ("B", "t1", 2L)))
    XTableSync.syncIceberg(t)
    def viaIceberg = XTableSync.readIceberg(spark, root)
      .select("key", "date", "volume").as[(String, String, Long)].collect().toSet
    def viaApi = t.read()
      .select("key", "date", "volume").as[(String, String, Long)].collect().toSet
    assert(viaIceberg == viaApi)

    // advance the table; the NEW metadata version supersedes — the
    // reader follows current-snapshot-id, never a stale snapshot
    t.upsert(rows(("B", "t2", 7L), ("C", "t2", 3L)))
    XTableSync.syncIceberg(t)
    assert(viaIceberg == viaApi)
    assert(viaIceberg.map(_._1) == Set("A", "B", "C"))
    assert(viaIceberg.find(_._1 == "B").get._3 == 7L)
  }

  test("Iceberg avro manifests round-trip through avro-core with spec field-ids") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val root = tmp()
    val t = GraftTable.create(spark, root, cfg("xtav"))
    t.insert(rows(("A", "t1", 1L), ("B", "t1", 2L)))
    XTableSync.syncIceberg(t)
    val metaDir = Paths.get(root, "metadata")
    val snap = Files.list(metaDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("snap-")).get
    // manifest list → manifest path
    val lr = new DataFileReader(snap.toFile,
      new GenericDatumReader[GenericRecord]())
    val listEntry = lr.next()
    val manifestPath = listEntry.get("manifest_path").toString
    assert(listEntry.getSchema.getField("manifest_path")
      .getObjectProp("field-id") == 500)
    lr.close()
    // manifest → data files, every referenced file exists
    val mr = new DataFileReader(Paths.get(manifestPath).toFile,
      new GenericDatumReader[GenericRecord]())
    val entries = Iterator.continually(mr).takeWhile(_.hasNext).map(_.next()).toList
    mr.close()
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      assert(df.get("file_format").toString == "PARQUET")
      assert(Files.exists(Paths.get(df.get("file_path").toString)))
      assert(df.get("record_count").asInstanceOf[Long] > 0L)
      assert(df.getSchema.getField("file_path").getObjectProp("field-id") == 100)
      // partition record carries the identity partition value
      val part = df.get("partition").asInstanceOf[GenericRecord]
      assert(part.get("date").toString == "2018/08/31")
    }
    assert(entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum == 2L)
  }

  test("cleaning never deletes files still referenced by the live snapshot") {
    val t = GraftTable.create(spark, tmp(), cfg("clean2"))
    (1 to 4).foreach(i => t.upsert(rows(("A", s"t$i", i.toLong))))
    val liveBefore = t.log.liveFiles().map(_.path).toSet
    val deleted = TableServices.clean(t, retainCommits = 2).toSet
    assert(deleted.intersect(liveBefore).isEmpty)
    assert(t.read().select("volume").as[Long].head() == 4L)
  }

  test("vector-index maintenance races a live writer: each call pins " +
      "a snapshot instant; a commit landing mid-maintenance is served " +
      "by the NEXT call — 3 consecutive runs") {
    def nv(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding", col("embedding").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true)))
    def emb(i: Long): Seq[Double] =
      Array.tabulate(8)(j => math.sin(i * 8 + j + 1) + 2.0).toSeq
    for (run <- 1 to 3) {
      val t = GraftTable.create(spark, tmp(), TableConfig(
        name = s"vrace$run", keyField = "vec_id", orderingField = "ver",
        numBuckets = 2))
      t.bulkInsert(nv((0 until 80).map(i =>
        (i.toLong, emb(i), 1L)).toDF("vec_id", "embedding", "ver")))
      graft.core.TableServices.buildVectorIndex(
        t, "vec_id", "embedding", nLists = 4)
      def stampInstant(): String =
        TableServices.vectorIndexStats(t, "embedding").stampInstant
      // ONE writer commits batches while the ONE maintainer loops —
      // the documented one-maintainer contract; the race is between
      // table commits and the service's snapshot pin
      val failure =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val writer = new Thread(() => {
        try for (b <- 0 until 6) {
          val lo = 1000 + b * 10
          t.upsert(nv((lo until lo + 10).map(i =>
            (i.toLong, emb(i), 2L)).toDF("vec_id", "embedding", "ver")))
        } catch { case e: Throwable => failure.set(e) }
      })
      writer.start()
      for (_ <- 0 until 4) {
        // the stamp after a call must be an instant that EXISTED during
        // the call — never past the timeline (a mid-call commit is not
        // folded in; the next call picks it up)
        val before = t.log.lastInstant().get
        graft.core.TableServices.buildVectorIndex(
          t, "vec_id", "embedding", nLists = 4)
        val after = t.log.lastInstant().get
        val stamp = stampInstant()
        assert(stamp >= before && stamp <= after,
          s"run $run: stamp $stamp outside [$before, $after]")
      }
      writer.join()
      assert(failure.get() == null, s"run $run writer failed: ${failure.get()}")
      // the writer is quiet: the NEXT call reaches the timeline head
      graft.core.TableServices.buildVectorIndex(
        t, "vec_id", "embedding", nLists = 4)
      assert(stampInstant() == t.log.lastInstant().get,
        s"run $run: post-race maintenance must reach the head")
      // and the index serves the full post-race state exactly
      val queries = t.read()
        .filter(col("vec_id").isin(5L, 1000L, 1059L))
        .select("vec_id", "embedding")
      val path = TableServices.vectorIndexPath(t, "embedding")
      val got = graft.operators.IvfIndex.topK(spark, path, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val want = graft.operators.Similarity.bruteForceTopK(
        t.read().select("vec_id", "embedding"), queries,
        "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"run $run: post-race search diverged")
    }
  }
}
