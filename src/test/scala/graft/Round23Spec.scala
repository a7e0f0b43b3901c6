package graft

import graft.operators.{Dedup, IncrementalSemanticDedup, SemanticDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-23 claims.
  *
  * Incremental SemDeDup equivalence (the [[graft.operators.IncrementalDedup]]
  * pattern applied to the last batch-only dedup-family member): with the
  * coarse quantizer frozen on the union corpus, streaming the corpus
  * through [[IncrementalSemanticDedup.dedupBatch]] in batches must
  * reproduce the batch operator exactly — pair set, group partitions,
  * centroid cosines — on tight-duplicate corpora (all intra-group pairs
  * ≥ threshold, the regime SemDeDup is published for). */
class Round23Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val dim = 16
  private val threshold = 0.95

  /** The SemanticDedupSpec corpus: 40 near-orthogonal unit vectors,
    * a tight duplicate for every 4th, a second for every 8th. */
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = (0 until 40).map { i =>
      i.toLong -> unit(Array.fill(dim)(rnd.nextGaussian()))
    }
    val dups = base.collect { case (i, v) if i % 4 == 0 =>
      val copies = if (i % 8 == 0) 2 else 1
      (1 to copies).map { c =>
        (1000L * c + i) -> unit(v.map(_ + 0.004 * rnd.nextGaussian()))
      }
    }.flatten
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r23-$tag-").toString

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("3-batch incremental SemDeDup equals the batch operator on tight duplicates") {
    val c = corpus.cache(); c.count()
    val inc = new IncrementalSemanticDedup(spark, tmp("inc"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")

    // stream the corpus in three interleaved batches (dup ids 1000+i /
    // 2000+i land in different batches than their originals)
    val batches = (0 until 3).map(i => c.filter(col("vec_id") % 3 === i))
    assert(batches.forall(_.count() > 0))
    val pairsUnion = batches.zipWithIndex
      .map { case (b, i) => inc.dedupBatch(b, "vec_id", "embedding", i + 1L) }
      .reduce(_ unionByName _).distinct()

    // (1) pair-set equality with exact all-pairs — the batch operator's
    // own gate regime (tight duplicates co-cluster, recall is total)
    val exact = Dedup.embeddingCosinePairs(c, "vec_id", "embedding", threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    assert(pairSet(exact).nonEmpty, "corpus planted no duplicate pairs")
    assert(pairSet(pairsUnion) == pairSet(exact),
      "union of per-batch pairs diverges from exact all-pairs")

    // (2) verdict-store group partitions equal batch verdicts exactly
    // (canonical ids are min member id in both paths)
    val batchV = SemanticDedup.verdicts(c, "vec_id", "embedding",
      nClusters = 8, threshold = threshold, indexPath = tmp("batchidx"))
      .cache()
    val expGroups = batchV.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    val gotV = inc.verdictStore.read()
      .select(col("vec_id").cast("long"), col("group_id").cast("long"),
        col("centroid_cos"), col("keep")).cache()
    val gotGroups = gotV.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    assert(gotGroups == expGroups,
      s"incremental groups diverge: got $gotGroups exp $expGroups")

    // (3) exactly one keeper per group (tight groups grow monotonically
    // — no bridging, so the no-unrelease stream rule keeps exactly one)
    val keeps = gotV.filter(col("keep")).select("group_id", "vec_id")
      .as[(Long, Long)].collect()
    assert(keeps.map(_._1).distinct.length == keeps.length,
      "a group holds two keepers")
    assert(keeps.map(_._1).toSet == gotGroups.values.toSet,
      "a group lost its keeper")

    // (4) centroid cosines match the batch operator bit-for-bit: both
    // quantizers were trained deterministically on the same corpus
    val expCos = batchV.select("vec_id", "centroid_cos")
      .as[(Long, Double)].collect().toMap
    val gotCos = gotV.select("vec_id", "centroid_cos")
      .as[(Long, Double)].collect().toMap
    assert(gotCos == expCos, "centroid_cos diverged from the batch path")

    // (5) survivors: every group contributes exactly one, ungrouped
    // docs all survive
    val survivors = inc.survivors().select(col("vec_id").cast("long"))
      .as[Long].collect().toSet
    val allIds = c.select("vec_id").as[Long].collect().toSet
    val grouped = gotGroups.keySet
    assert((allIds -- grouped).subsetOf(survivors))
    gotGroups.values.toSet.foreach { (g: Long) =>
      val members = gotGroups.filter(_._2 == g).keySet
      assert((members & survivors).size == 1,
        s"group $g released ${(members & survivors).size} members")
    }
    gotV.unpersist(); batchV.unpersist(); c.unpersist()
  }

  test("re-running the latest batch is crash recovery: identical state, identical pairs") {
    val c = corpus.cache(); c.count()
    val inc = new IncrementalSemanticDedup(spark, tmp("rec"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")
    val b1 = c.filter(col("vec_id") % 2 === 0)
    val b2 = c.filter(col("vec_id") % 2 === 1)
    inc.dedupBatch(b1, "vec_id", "embedding", 1L).count()
    val firstRun = pairSet(inc.dedupBatch(b2, "vec_id", "embedding", 2L))
    def state() = inc.verdictStore.read()
      .select(col("vec_id").cast("long"), col("group_id").cast("long"),
        col("keep"))
      .as[(Long, Long, Boolean)].collect().toSet
    val s1 = state()
    val members1 = inc.members.read().count()
    // the recovery contract: only the LATEST batch may re-run
    val reRun = pairSet(inc.dedupBatch(b2, "vec_id", "embedding", 2L))
    assert(reRun == firstRun, "recovery re-run returned different pairs")
    assert(state() == s1, "recovery re-run mutated the verdict store")
    assert(inc.members.read().count() == members1,
      "recovery re-run double-inserted members")
    // monotonicity is enforced: an older batch number is refused
    val ex = intercept[IllegalArgumentException] {
      inc.dedupBatch(b1, "vec_id", "embedding", 1L)
    }
    assert(ex.getMessage.contains("monotone"))
    c.unpersist()
  }

  test("adoptDelta as MOR: base-file adoption, delta upserts, fold on touch") {
    import java.nio.file.{Files, Paths}
    val root = tmp("mor") + "/dsrc"
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
    val s1 = writeFile("a.parquet", Seq((1L, 2L, 1.0), (2L, 2L, 2.0)))
    val s2 = writeFile("b.parquet", Seq((10L, 2L, 10.0)))
    Files.write(Paths.get(root, "_delta_log", f"${0L}%020d.json"),
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
        s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$s1,"modificationTime":1,"dataChange":true}}""",
        s"""{"add":{"path":"b.parquet","partitionValues":{},"size":$s2,"modificationTime":1,"dataChange":true}}"""))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val t = graft.interop.XTableSync.adoptDelta(spark, root,
      graft.core.TableConfig(name = "adoptedmor", keyField = "id",
        orderingField = "ts", numBuckets = 2,
        tableType = graft.core.TableConfig.Mor))
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "ts", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(state(t.read()) == Set((1L, 2L, 1.0), (2L, 2L, 2.0), (10L, 2L, 10.0)))
    // the adopted parquet ARE the base files: adoption rewrote nothing
    assert(t.log.liveFiles().forall(f => !f.delta))
    // a delta upsert touching file a's key range folds ONLY that file;
    // the untouched bootstrap file b stays unbucketed (progressive)
    t.upsert(Seq((2L, 3L, 9.0), (3L, 3L, 3.0)).toDF("id", "ts", "score"))
    val live = t.log.liveFiles()
    assert(live.exists(_.delta), "MOR upsert must append a delta file")
    assert(!live.exists(f =>
      f.bucket == graft.core.GraftTable.BootstrapBucket &&
      !f.delta && f.minKey == "1"),
      "overlapping bootstrap file was not folded")
    assert(live.exists(f =>
      f.bucket == graft.core.GraftTable.BootstrapBucket && f.rows == 1),
      "non-overlapping bootstrap file should stay unbucketed")
    val expect = Set((1L, 2L, 1.0), (2L, 3L, 9.0), (3L, 3L, 3.0),
      (10L, 2L, 10.0))
    assert(state(t.read()) == expect)
    // read-optimized lags (delta rows invisible); compaction catches it up
    assert(state(t.readOptimized()) ==
      Set((1L, 2L, 1.0), (2L, 2L, 2.0), (10L, 2L, 10.0)))
    // the continued foreign log tracks the READ-OPTIMIZED view: synced
    // BEFORE compaction it must equal readOptimized — a delta parquet
    // leaked as a Delta add-action would surface both versions of key
    // 2 and fail this set compare
    graft.interop.XTableSync.syncDelta(t)
    assert(state(graft.interop.XTableSync.readDelta(spark, root)) ==
      state(t.readOptimized()),
      "pre-compaction foreign replay must equal the read-optimized view")
    graft.core.TableServices.compact(t)
    assert(state(t.readOptimized()) == expect)
    // the continued _delta_log tracks the base-file view — after
    // compaction a foreign Delta reader sees the full state
    graft.interop.XTableSync.syncDelta(t)
    assert(state(graft.interop.XTableSync.readDelta(spark, root)) == expect)
  }

  test("MOR delete folds overlapping bootstrap files so tombstones take effect") {
    val root = tmp("mordel")
    val src = tmp("mordel-src")
    Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0))
      .toDF("id", "ts", "score").coalesce(1).write.mode("overwrite").parquet(src)
    val t = graft.core.GraftTable.create(spark, root + "/t",
      graft.core.TableConfig(name = "mordel", keyField = "id",
        orderingField = "ts", numBuckets = 2,
        tableType = graft.core.TableConfig.Mor))
    t.bootstrapFrom(src)
    assert(t.read().count() == 3)
    t.deleteWhere(col("id") === 2L)
    val ids = t.read().select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L),
      s"tombstone must reach the adopted rows, got $ids")
  }

  test("streaming sink into an adopted Delta table keeps the foreign log replayable") {
    import java.nio.file.{Files, Paths}
    val base = tmp("adoptstream")
    val root = s"$base/dsrc"
    Files.createDirectories(Paths.get(root, "_delta_log"))
    def writeFile(name: String, rows: Seq[(String, Long, Double)]): Long = {
      val tmpd = s"$root/.tmp"
      rows.toDF("k", "ts", "v").coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = graft.util.Fs.list(Paths.get(tmpd))(_
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
      Files.move(part, Paths.get(root, name))
      graft.util.TempDirs.deleteRecursively(Paths.get(tmpd))
      Files.size(Paths.get(root, name))
    }
    val schema = Seq(("a", 1L, 0.0)).toDF("k", "ts", "v").schema.json
    val meta = graft.core.CommitLog.mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0", "format" -> Map("provider" -> "parquet"),
        "schemaString" -> schema, "partitionColumns" -> Seq.empty)))
    val s1 = writeFile("a.parquet", Seq(("a", 1L, 1.0), ("b", 1L, 2.0)))
    Files.write(Paths.get(root, "_delta_log", f"${0L}%020d.json"),
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
        s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$s1,"modificationTime":1,"dataChange":true}}"""))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val t = graft.interop.XTableSync.adoptDelta(spark, root,
      graft.core.TableConfig(name = "adoptstream", keyField = "k",
        orderingField = "ts", numBuckets = 2))
    val src = graft.core.GraftTable.create(spark, s"$base/src",
      graft.core.TableConfig(name = "adoptstream_src", keyField = "k",
        orderingField = "ts", numBuckets = 2))
    src.insert(Seq(("c", 2L, 3.0)).toDF("k", "ts", "v"))
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "ts", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // the l17 exactly-once sink drives the ADOPTED table; after each
    // epoch the continued _delta_log must replay to the same rows a
    // graft read serves (cursor + reconcile interplay under streaming
    // epoch commits — ≥ 2 epochs)
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$base/src").load()
      .select("k", "ts", "v")
      .writeStream.outputMode("append").format("graft-stream")
      .option("path", root)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      graft.interop.XTableSync.syncDelta(t)
      val after1 = Set(("a", 1L, 1.0), ("b", 1L, 2.0), ("c", 2L, 3.0))
      assert(state(t.read()) == after1)
      assert(state(graft.interop.XTableSync.readDelta(spark, root)) == after1,
        "epoch-1 foreign replay diverged from the graft snapshot")
      // epoch 2: an update through the stream (touches the adopted file)
      src.upsert(Seq(("b", 3L, 9.0), ("d", 3L, 4.0)).toDF("k", "ts", "v"))
      q.processAllAvailable()
      graft.interop.XTableSync.syncDelta(t)
      val after2 = Set(("a", 1L, 1.0), ("b", 3L, 9.0), ("c", 2L, 3.0),
        ("d", 3L, 4.0))
      assert(state(t.read()) == after2)
      assert(state(graft.interop.XTableSync.readDelta(spark, root)) == after2,
        "epoch-2 foreign replay diverged from the graft snapshot")
      // the sink stamped ≥ 2 distinct epochs on the adopted timeline
      val epochs = t.log.commits()
        .flatMap(_.extra.get(graft.sql.GraftStreamingWrite.EpochKey))
      assert(epochs.distinct.size >= 2, s"epochs $epochs")
    } finally q.stop()
  }

  test("bm25TopK survives idCol == queryIdCol (suffixed output names)") {
    val docs = Seq((1L, "spark filter join"), (2L, "table scan"),
      (3L, "spark join")).toDF("id", "text")
    val qs = Seq((10L, "spark join")).toDF("id", "qtext")
    val out = graft.operators.Selection.bm25TopK(
      docs, "id", "text", qs, "id", "qtext", k = 2)
    assert(out.columns.toSeq ==
      Seq("query_id", "doc_id", "score_micro", "bm_rank"))
    val rows = out.select("query_id", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(rows.nonEmpty && rows.forall(_._1 == 10L))
    // distinct names keep their original spellings
    val out2 = graft.operators.Selection.bm25TopK(
      docs, "id", "text", qs.toDF("qid", "qtext"), "qid", "qtext", k = 2)
    assert(out2.columns.toSeq == Seq("qid", "id", "score_micro", "bm_rank"))
  }

  test("knnLabel fails loudly on a vector shorter than dims") {
    val ref = Seq((1L, Array.fill(4)(0.5), "a")).toDF("id", "vec", "lab")
    val corpus = Seq((2L, Array.fill(2)(0.5))).toDF("id", "vec")
    val ex = intercept[Exception] {
      graft.operators.Similarity.knnLabel(corpus, ref, "id", "vec", "lab",
        k = 1, dims = 4).collect()
    }
    assert(ex.getMessage.contains("shorter than dims"),
      s"expected the size guard, got: ${ex.getMessage}")
  }

  test("catalog dropTable removes the table's temp views") {
    val wh = tmp("cat")
    val cat = new graft.sql.GraftCatalog(spark, wh)
    val t = cat.createTable(graft.core.TableConfig(name = "dropv",
      keyField = "k", orderingField = "ts", numBuckets = 1))
    t.insert(Seq(("a", 1L, 1.0)).toDF("k", "ts", "v"))
    cat.syncViews()
    assert(spark.catalog.tableExists("dropv"))
    cat.dropTable("dropv")
    assert(!spark.catalog.tableExists("dropv"),
      "dropTable left a stale temp view resolving deleted files")
  }

  test("freeze refuses to retrain under persisted assignments") {
    val c = corpus
    val inc = new IncrementalSemanticDedup(spark, tmp("frz"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")
    inc.dedupBatch(c.limit(10), "vec_id", "embedding", 1L).count()
    val ex = intercept[IllegalArgumentException] {
      inc.freeze(c, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("frozen"))
  }
}
