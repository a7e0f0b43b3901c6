package graft

import java.nio.file.{Files, Paths}

import graft.interop.XTableSync
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-25 claims, part 1 — the r14 advisor findings, each refused or
  * repaired loudly:
  *
  *  - [[XTableSync.checkpointDelta]] REFUSES a foreign `_delta_log`
  *    whose replayed state its explicit checkpoint schema cannot carry
  *    (setTransaction actions, deletion vectors, table-features
  *    protocol) instead of silently dropping that state before
  *    [[XTableSync.expireDeltaLog]] makes the loss permanent;
  *  - [[XTableSync.expireIcebergMetadata]] orphan-sweeps manifest
  *    avros hidden behind an already-missing manifest-list (an earlier
  *    partial expire) instead of leaking them permanently;
  *  - the unigram DP's `cost·1024 + n_pieces` radix guard: words of
  *    ≥ 1024 letters are DECLARED unsegmentable in both engines rather
  *    than silently bleeding the piece count into the cost field.
  */
class Round25Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r25-$tag-").toString

  /** Minimal one-version foreign Delta log: protocol + metaData + one
    * add, plus `extra` action lines appended as version 1. */
  private def foreignDelta(root: String, extra: Seq[String] = Seq.empty,
      protocolLine: String =
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      : Unit = {
    Files.createDirectories(Paths.get(root, "_delta_log"))
    val tmpd = s"$root/.tmp"
    Seq((1L, 1L, 1.0)).toDF("id", "ts", "score").coalesce(1)
      .write.mode("overwrite").parquet(tmpd)
    val part = graft.util.Fs.list(Paths.get(tmpd))(_
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
    Files.move(part, Paths.get(root, "a.parquet"))
    graft.util.TempDirs.deleteRecursively(Paths.get(tmpd))
    val sz = Files.size(Paths.get(root, "a.parquet"))
    val schema = Seq((1L, 1L, 0.0)).toDF("id", "ts", "score").schema.json
    val meta = graft.core.CommitLog.mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0", "format" -> Map("provider" -> "parquet"),
        "schemaString" -> schema, "partitionColumns" -> Seq.empty)))
    def w(ver: Long, actions: Seq[String]): Unit = Files.write(
      Paths.get(root, "_delta_log", f"$ver%020d.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    w(0L, Seq(protocolLine, meta,
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}"""))
    if (extra.nonEmpty) w(1L, extra)
  }

  test("checkpointDelta refuses txn (setTransaction) actions — the " +
      "checkpoint schema cannot preserve them") {
    val root = tmp("txn") + "/d"
    foreignDelta(root, extra = Seq(
      """{"txn":{"appId":"stream-7","version":42,"lastUpdated":3}}"""))
    val e = intercept[IllegalArgumentException](
      XTableSync.checkpointDelta(spark, root))
    assert(e.getMessage.contains("setTransaction"))
    // the log itself stays replayable — only checkpointing is refused
    assert(XTableSync.replayDelta(root).liveFiles == Seq("a.parquet"))
  }

  test("checkpointDelta refuses deletion vectors on add and remove") {
    val root = tmp("dv") + "/d"
    foreignDelta(root, extra = Seq(
      """{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":36,"cardinality":2}}}"""))
    val e = intercept[IllegalArgumentException](
      XTableSync.checkpointDelta(spark, root))
    assert(e.getMessage.contains("deletionVector"))
  }

  test("checkpointDelta refuses protocol beyond the (1,2) envelope and " +
      "table features") {
    val root = tmp("proto") + "/d"
    foreignDelta(root, protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""")
    val e = intercept[IllegalArgumentException](
      XTableSync.checkpointDelta(spark, root))
    assert(e.getMessage.contains("envelope"))
  }

  test("checkpointDelta refuses a prior FOREIGN checkpoint carrying txn " +
      "rows in columns its own replay never extracts") {
    val root = tmp("fcp") + "/d"
    val logDir = Paths.get(root, "_delta_log")
    Files.createDirectories(logDir)
    // a foreign single-part checkpoint at v0 whose only surviving state
    // beyond (protocol, metaData, add) is a txn row
    val schema = Seq((1L, 1L, 0.0)).toDF("id", "ts", "score").schema.json
    val cp = spark.range(3).select(
      when($"id" === 0, struct(lit(1).as("minReaderVersion"),
        lit(2).as("minWriterVersion"))).as("protocol"),
      when($"id" === 1, struct(lit("0").as("id"),
        lit(schema).as("schemaString"),
        array().cast("array<string>").as("partitionColumns"))).as("metaData"),
      when($"id" === 2, struct(lit("app-1").as("appId"),
        lit(9L).as("version"))).as("txn"))
    val tmpd = logDir.resolve(".cp")
    cp.coalesce(1).write.parquet(tmpd.toString)
    val part = graft.util.Fs.list(tmpd)(_
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
    Files.move(part, logDir.resolve(f"${0L}%020d.checkpoint.parquet"))
    graft.util.TempDirs.deleteRecursively(tmpd)
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":3}""")
    val e = intercept[IllegalArgumentException](
      XTableSync.checkpointDelta(spark, root))
    assert(e.getMessage.contains("txn"))
  }

  test("checkpointDelta still succeeds on the clean shape after the " +
      "guards — and self-written checkpoints re-checkpoint") {
    val root = tmp("ok") + "/d"
    foreignDelta(root)
    assert(XTableSync.checkpointDelta(spark, root) == 0L)
    // our own checkpoint passes the foreign-seed probe on the next call
    assert(XTableSync.checkpointDelta(spark, root) == 0L)
  }

  test("expireIcebergMetadata orphan-sweeps manifests hidden behind an " +
      "already-missing manifest-list instead of leaking them") {
    val root = tmp("iceorph") + "/t"
    val t = graft.core.GraftTable.create(spark, root,
      graft.core.TableConfig(name = "iceorph", keyField = "id",
        orderingField = "ts", numBuckets = 1))
    (1 to 3).foreach { i =>
      t.upsert(Seq((i.toLong, i.toLong, i * 1.0)).toDF("id", "ts", "score"))
      XTableSync.syncIceberg(t)
    }
    val metaDir = Paths.get(root, "metadata")
    def avros() = graft.util.Fs.list(metaDir)(
      _.filter(_.getFileName.toString.endsWith(".avro")).toSeq).toSet
    def versions() = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq)
      .flatMap("^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(_)
        .map(_.group(1).toLong)).sorted
    def snapOf(v: Long): (java.nio.file.Path, Long) = {
      val n = graft.core.CommitLog.mapper.readTree(
          Files.readAllBytes(metaDir.resolve(s"v$v.metadata.json")))
        .get("snapshots").elements().next()
      (XTableSync.icebergLocalPath(n.get("manifest-list").asText()),
        n.get("snapshot-id").asLong())
    }
    val vs = versions()
    assert(vs.size == 3)
    // simulate an earlier partial expire: a to-be-DROPPED version's
    // manifest-LIST avro is gone, its manifest avro survives — the ref
    // walk can no longer reach that manifest through its metadata.json
    val (dropList, dropSnap) = snapOf(vs.head)
    assert(Files.exists(metaDir.resolve(s"manifest-$dropSnap-m0.avro")))
    Files.delete(dropList)
    val deleted = XTableSync.expireIcebergMetadata(root, keepVersions = 1)
    // the kept head still resolves, and NOTHING unreferenced survives:
    // the only avros on disk are the kept snapshot's list + manifest
    val (_, keptSnap) = snapOf(vs.last)
    assert(avros().map(_.getFileName.toString) ==
      Set(s"snap-$keptSnap.avro", s"manifest-$keptSnap-m0.avro"))
    // specifically: the orphaned manifest avro is GONE
    assert(!Files.exists(metaDir.resolve(s"manifest-$dropSnap-m0.avro")),
      "the manifest hidden behind the missing list must be swept")
    assert(deleted.exists(_.endsWith(s"manifest-$dropSnap-m0.avro")))
    assert(XTableSync.readIceberg(spark, root).count() == 3)
  }

  test("expireIcebergMetadata refuses the orphan sweep when a KEPT " +
      "version's manifest-list is missing (corrupt table)") {
    val root = tmp("icecorr") + "/t"
    val t = graft.core.GraftTable.create(spark, root,
      graft.core.TableConfig(name = "icecorr", keyField = "id",
        orderingField = "ts", numBuckets = 1))
    (1 to 3).foreach { i =>
      t.upsert(Seq((i.toLong, i.toLong, i * 1.0)).toDF("id", "ts", "score"))
      XTableSync.syncIceberg(t)
    }
    val metaDir = Paths.get(root, "metadata")
    val vs = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq)
      .flatMap("^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(_)
        .map(_.group(1).toLong)).sorted
    def listOf(v: Long) = XTableSync.icebergLocalPath(
      graft.core.CommitLog.mapper.readTree(
        Files.readAllBytes(metaDir.resolve(s"v$v.metadata.json")))
      .get("snapshots").elements().next().get("manifest-list").asText())
    Files.delete(listOf(vs.head)) // broken DROP chain → sweep needed
    Files.delete(listOf(vs.last)) // broken KEPT chain → sweep refused
    val e = intercept[IllegalArgumentException](
      XTableSync.expireIcebergMetadata(root, keepVersions = 1))
    assert(e.getMessage.contains("corrupt"))
  }

  // ---- query-set ANN retrieval (IvfPq.topKBatch) ----------------------

  import graft.operators.IvfPq

  private def batchFixture(tag: String): (org.apache.spark.sql.DataFrame,
      String, graft.operators.Pq.Codebooks) = {
    val rnd = new scala.util.Random(25)
    val base = (1L to 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "embedding")
    val p = tmp(tag) + "/idx"
    val cb = IvfPq.build(base, "id", "embedding", nLists = 4, m = 2,
      codesPerSub = 4, path = p)
    (base, p, cb)
  }

  test("topKBatch equals per-query topKRerank for every query — same " +
      "neighbors, same ranks, bit-identical scores") {
    val (base, p, cb) = batchFixture("batcheq")
    val queries = base.filter($"id" <= 5)
    val got = IvfPq.topKBatch(queries, "id", "embedding", p, cb,
        k = 4, nProbe = 2, candidates = 12)
      .select($"query_id", $"neighbor_id", $"score", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).toSeq).toMap
    val qvecs = queries.as[(Long, Seq[Double])].collect()
    qvecs.foreach { case (qid, v) =>
      val want = IvfPq.topKRerank(spark, p, cb, v.toArray, k = 4,
          nProbe = 2, candidates = 12)
        .select($"id", $"score").as[(Long, Double)].collect()
        .zipWithIndex.map { case ((id, s), i) => (qid, id, s, i + 1L) }.toSeq
      assert(got(qid) == want, s"query $qid: ${got(qid)} != $want")
    }
  }

  test("topKBatch plans ONE pruned codes scan and ONE pruned " +
      "assignments scan for the whole query set") {
    val (base, p, cb) = batchFixture("batchscan")
    val res = IvfPq.topKBatch(base.filter($"id" <= 5), "id", "embedding",
      p, cb, k = 3, nProbe = 2, candidates = 8)
    res.collect() // force execution so AQE finalizes the plan
    // walk THROUGH adaptive wrappers: TreeNode.collect stops at
    // AdaptiveSparkPlanExec/QueryStageExec boundaries
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: flatten(r.child)
      case other => other +: other.children.flatMap(flatten)
    }
    def scansOf(rel: String) = flatten(res.queryExecution.executedPlan)
      .collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(rel)) =>
          s.selectedPartitions.partitionCount
      }
    val codeScans = scansOf("pq_codes")
    val asgScans = scansOf("assignments")
    assert(codeScans.size == 1,
      s"expected ONE codes scan for the whole set, got ${codeScans.size}")
    assert(asgScans.size == 1,
      s"expected ONE assignments scan, got ${asgScans.size}")
    // 5 queries × nProbe=2 probe at most min(10, 4) = 4 lists; with a
    // clustered fixture the union is typically smaller than nLists —
    // the scan must be pruned to the union, never the full index
    assert(codeScans.head <= 4 && asgScans.head <= 4)
    // and the per-query rank filters push below the exchange
    assert(flatten(res.queryExecution.executedPlan)
        .exists(_.nodeName.contains("WindowGroupLimit")),
      "row_number <= k must plan a WindowGroupLimit, not a full sort")
  }

  test("topKBatch guards: duplicate query ids refused loudly; past " +
      "maxQueries the engine chunks (Round26Spec), and only past " +
      "maxQueries x maxPasses does it refuse") {
    val (base, p, cb) = batchFixture("batchguard")
    val dup = base.filter($"id" <= 2)
      .union(base.filter($"id" === 1))
    val e1 = intercept[IllegalArgumentException](
      IvfPq.topKBatch(dup, "id", "embedding", p, cb,
        k = 2, nProbe = 2, candidates = 4))
    assert(e1.getMessage.contains("duplicate"))
    // over-cap now CHUNKS into passes instead of refusing: 10 queries
    // at maxQueries=5 answer identically to one uncapped pass
    val chunked = IvfPq.topKBatch(base.filter($"id" <= 10), "id",
        "embedding", p, cb, k = 2, nProbe = 2, candidates = 4,
        maxQueries = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val onePass = IvfPq.topKBatch(base.filter($"id" <= 10), "id",
        "embedding", p, cb, k = 2, nProbe = 2, candidates = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(chunked == onePass)
    // the TOTAL bound (maxQueries x 256 passes) still refuses loudly —
    // every pass's broadcast stays referenced by the returned plan
    val e2 = intercept[IllegalArgumentException](
      IvfPq.topKBatch(base.filter($"id" <= 10), "id", "embedding", p, cb,
        k = 2, nProbe = 2, candidates = 4, maxQueries = 5,
        maxPasses = 1))
    assert(e2.getMessage.contains("maxPasses"))
  }

  test("topKBatchStream: streamed query micro-batches answer per epoch, " +
      "and a checkpoint replay overwrites idempotently") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
      StructField, StructType}
    val (base, p, cb) = batchFixture("batchstream")
    val in = tmp("qin")
    val all = base.as[(Long, Seq[Double])].collect()
    def writeQueries(name: String, ids: Seq[Long]): Unit =
      Files.write(Paths.get(in, name),
        all.filter(q => ids.contains(q._1)).map { case (id, v) =>
          s"""{"id":$id,"embedding":[${v.mkString(",")}]}"""
        }.mkString("\n").getBytes("UTF-8"))
    writeQueries("q0.json", Seq(1L, 2L, 3L))
    writeQueries("q1.json", Seq(4L, 5L))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val out = tmp("qout")
    val ckpt = tmp("qckpt")
    def start() = IvfPq.topKBatchStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in),
      "id", "embedding", p, cb, k = 3, nProbe = 2, candidates = 8,
      checkpointDir = ckpt, outPath = out)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    def results() = spark.read.parquet(out)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    val want = IvfPq.topKBatch(base.filter($"id" <= 5), "id", "embedding",
        p, cb, k = 3, nProbe = 2, candidates = 8)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(results() == want,
      "union of per-epoch answers must equal the one-shot batch answer")
    // restart from the same checkpoint: nothing replays, results hold
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(results() == want)
  }

  // ---- drift-consuming retrain (refreeze) -----------------------------

  import graft.operators.{Dedup, IncrementalSemanticDedup}

  private val semDim = 16

  private def unitVec(v: Array[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
  }

  /** Two distribution waves: wave 1 near-orthogonal gaussians, wave 2
    * SHIFTED (a constant offset dominates every coordinate) so wave-1
    * centroids fit it badly — the drift regime refreeze exists for.
    * Every 4th base in each wave gets a tight duplicate. */
  private def waves: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val rnd = new scala.util.Random(31)
    def base(ids: Range, shift: Double) = ids.map { i =>
      i.toLong -> unitVec(Array.fill(semDim)(rnd.nextGaussian() + shift))
    }
    def dups(b: Seq[(Long, Seq[Double])], off: Long) =
      b.collect { case (i, v) if i % 4 == 0 =>
        (off + i) -> unitVec(v.toArray.map(_ + 0.004 * rnd.nextGaussian()))
      }
    val w1b = base(0 until 20, 0.0)
    val w2b = base(100 until 120, 3.0)
    val w3d = dups(w2b, 2000L) // wave-3: NEW duplicates of wave-2 bases
    ((w1b ++ dups(w1b, 1000L)).toDF("vec_id", "embedding"),
      (w2b ++ dups(w2b, 1000L)).toDF("vec_id", "embedding"),
      w3d.toDF("vec_id", "embedding"))
  }

  test("IncrementalSemanticDedup.refreeze: drift drops, released " +
      "verdicts survive verbatim, and the union result still equals " +
      "the batch operator") {
    val (w1, w2, w3) = waves
    val inc = new IncrementalSemanticDedup(spark, tmp("refreeze"),
      nClusters = 8, threshold = 0.95)
    inc.freeze(w1, "vec_id", "embedding")
    val p1 = inc.dedupBatch(w1, "vec_id", "embedding", 1L).cache()
    p1.count()
    val driftBefore = inc.driftRatio(w2, "embedding")
    assert(driftBefore > 1.5,
      s"fixture must actually drift; got ratio $driftBefore")
    val p2 = inc.dedupBatch(w2, "vec_id", "embedding", 2L).cache()
    p2.count()
    def verdictMap() = inc.verdictStore.read()
      .select($"vec_id".cast("long"), $"group_id".cast("long"), $"keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val before = verdictMap()
    assert(before.nonEmpty)
    inc.refreeze()
    // (1) group ids and released flags preserved VERBATIM
    assert(verdictMap() == before,
      "refreeze must never move a group id or unrelease a keeper")
    // (2) the migrated clusters are consistent: every verdict row's
    // cluster equals its member row's re-assigned list
    val memberLists = inc.members.read()
      .select($"id".cast("long"), $"list".cast("int"))
      .as[(Long, Int)].collect().toMap
    val verdictClusters = inc.verdictStore.read()
      .select($"vec_id".cast("long"), $"cluster".cast("int"))
      .as[(Long, Int)].collect().toMap
    verdictClusters.foreach { case (id, cl) =>
      assert(memberLists(id) == cl,
        s"doc $id: verdict cluster $cl != member list ${memberLists(id)}")
    }
    // (3) the retrained quantizer fits the drifted wave again
    val driftAfter = inc.driftRatio(w2, "embedding")
    assert(driftAfter < driftBefore / 2,
      s"drift must drop after refreeze: $driftBefore -> $driftAfter")
    // (4) dedupBatch continues under the new quantizer, and the union
    // of every batch's pairs equals exact all-pairs on the union corpus
    val p3 = inc.dedupBatch(w3, "vec_id", "embedding", 3L)
    val union = w1.unionByName(w2).unionByName(w3)
    val exact = Dedup.embeddingCosinePairs(union, "vec_id", "embedding", 0.95)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_a".cast("long"), $"doc_b".cast("long"))
        .as[(Long, Long)].collect().toSet
    assert(ps(p1.unionByName(p2).unionByName(p3)) == ps(exact),
      "post-refreeze union of batch pairs diverges from exact all-pairs")
    // (5) no keeper lost: every pre-refreeze keeper still keeps
    val keepersAfter = inc.verdictStore.read().filter($"keep")
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    before.collect { case (id, (_, true)) => id }.foreach(id =>
      assert(keepersAfter.contains(id), s"keeper $id was unreleased"))
    p1.unpersist(); p2.unpersist()
    ()
  }

  test("refreeze mid-stream: stop, retrain, resume under a fresh " +
      "checkpoint — verdicts hold, late duplicates group under the " +
      "retrained quantizer") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
      StructField, StructType}
    val (w1, w2, w3) = waves
    val inc = new IncrementalSemanticDedup(spark, tmp("refstream"),
      nClusters = 8, threshold = 0.95)
    inc.freeze(w1, "vec_id", "embedding")
    val in = tmp("refin")
    def writeBatch(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      Files.write(Paths.get(in, name),
        df.as[(Long, Seq[Double])].collect().map { case (id, v) =>
          s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
        }.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    writeBatch("b0.json", w1)
    writeBatch("b1.json", w2)
    val q = inc.dedupStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in),
      "vec_id", "embedding", checkpointDir = tmp("refck"), baseBatchNo = 1L)
    try q.processAllAvailable() finally q.stop()
    def verdictMap() = inc.verdictStore.read()
      .select($"vec_id".cast("long"), $"group_id".cast("long"), $"keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val before = verdictMap()
    assert(before.nonEmpty)
    inc.refreeze()
    assert(verdictMap() == before)
    // resume with the post-refreeze wave under a fresh checkpoint and a
    // baseBatchNo above the high-water mark
    val in2 = tmp("refin2")
    Files.write(Paths.get(in2, "b2.json"),
      w3.as[(Long, Seq[Double])].collect().map { case (id, v) =>
        s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
      }.mkString("\n").getBytes("UTF-8"))
    val q2 = inc.dedupStream(
      spark.readStream.schema(schema).json(in2),
      "vec_id", "embedding", checkpointDir = tmp("refck2"),
      baseBatchNo = 10L)
    try q2.processAllAvailable() finally q2.stop()
    // every wave-3 doc is a dup of a wave-2 base: grouped WITH its
    // original (the canonical id may be an older merge's — wave-2's
    // shifted vectors can legitimately bridge, and bridged groups keep
    // both keepers, the documented stream-dedup consequence)
    val after = verdictMap()
    val w3Ids = w3.select($"vec_id").as[Long].collect().toSet
    w3Ids.foreach { id =>
      assert(after.contains(id), s"late duplicate $id not grouped")
      assert(after.get(id - 2000L).exists(_._1 == after(id)._1),
        s"late duplicate $id (group ${after(id)._1}) not co-grouped with " +
        s"its original ${id - 2000L} (${after.get(id - 2000L)})")
    }
    assert(inc.survivors().filter($"vec_id".isin(w3Ids.toSeq: _*)).count() == 0,
      "late duplicates of released docs must not survive")
    // no pre-refreeze verdict moved
    before.foreach { case (id, gk) => assert(after(id) == gk) }
  }

  test("IvfPq.refreeze: retrains in place, preserves the appended " +
      "corpus and the appends journal, resets the drift baseline") {
    val rnd = new scala.util.Random(41)
    val base = (1L to 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "embedding")
    val drifted = (101L to 140L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian() + 3.0))).toDF("id", "embedding")
    val p = tmp("pqrefreeze") + "/idx"
    val n = 40 + 40
    IvfPq.build(base, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = n + 8, path = p)
    val st = IvfPq.append(drifted, "id", "embedding", p,
      batchId = Some("wave2"))
    assert(st.appended == 40L && st.driftRatio > 1.5,
      s"fixture must drift: $st")
    val cb2 = IvfPq.refreeze(spark, p)
    // corpus preserved: meta count covers build + append
    assert(graft.operators.IvfIndex.meta(p).get.corpusCount == n)
    // the journal carried over: a retried pre-refreeze batch is a no-op
    val retry = IvfPq.append(drifted, "id", "embedding", p,
      batchId = Some("wave2"))
    assert(retry.appended == 0L, "journal lost — retry double-appended")
    // lossless codebooks + full probe + all candidates ⇒ the refrozen
    // index answers EXACT inner-product top-k over the whole corpus
    val q = Array.fill(8)(rnd.nextGaussian() + 3.0)
    val all = base.unionByName(drifted).as[(Long, Seq[Double])].collect()
    val want = all.map { case (id, v) =>
      (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val got = IvfPq.topKRerank(spark, p, cb2, q, k = 5, nProbe = 2,
      candidates = n).select("id").as[Long].collect().toSeq
    assert(got == want, s"refrozen index: $got != $want")
    // drift baseline reset: the drifted wave now reads as in-family
    val st2 = IvfPq.append(drifted.withColumn("id", $"id" + 1000),
      "id", "embedding", p, batchId = Some("wave2-again"))
    assert(st2.driftRatio < st.driftRatio / 2,
      s"drift must reset after refreeze: ${st.driftRatio} -> ${st2.driftRatio}")
  }

  test("IvfPq.remove: victims leave both relations, an emptied list " +
      "cannot resurrect, meta updates, post-remove queries are exact") {
    val rnd = new scala.util.Random(61)
    val base = (1L to 48L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "embedding")
    val p = tmp("pqremove") + "/idx"
    val cb = IvfPq.build(base, "id", "embedding", nLists = 4, m = 2,
      codesPerSub = 64, path = p)
    val asg = spark.read.parquet(s"$p/assignments")
      .select($"id".cast("long"), $"list".cast("int"))
      .as[(Long, Int)].collect()
    // victims: EVERY member of the smallest list (the emptied-dir
    // case) plus two scattered ids from other lists
    val smallest = asg.groupBy(_._2).minBy(_._2.length)._1
    val wholeList = asg.filter(_._2 == smallest).map(_._1).toSeq
    val scattered = asg.filter(_._2 != smallest).map(_._1).sorted.take(2)
    val victims = (wholeList ++ scattered).toDF("id")
    val n = IvfPq.remove(victims, "id", p)
    assert(n == wholeList.size + 2L)
    assert(graft.operators.IvfIndex.meta(p).get.corpusCount == 48L - n)
    // the emptied list directory is GONE from both relations
    Seq("assignments", "pq_codes").foreach { rel =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(p, rel, s"list=$smallest")),
        s"$rel kept the emptied list directory")
    }
    // removal is idempotent
    assert(IvfPq.remove(victims, "id", p) == 0L)
    // full-probe exact re-rank equals brute force over the REMAINING
    // corpus — no removed id can ever come back
    val gone = (wholeList ++ scattered).toSet
    val q = Array.fill(8)(rnd.nextGaussian())
    val want = base.as[(Long, Seq[Double])].collect()
      .filterNot { case (id, _) => gone(id) }
      .map { case (id, v) => (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val got = IvfPq.topKRerank(spark, p, cb, q, k = 5, nProbe = 4,
      candidates = 48).select("id").as[Long].collect().toSeq
    assert(got == want, s"post-remove: $got != $want")
    // a half-applied journal marker blocks further maintenance loudly
    val marker = java.nio.file.Paths.get(p, "_appends", "x.inprogress")
    java.nio.file.Files.writeString(marker, "")
    val e = intercept[IllegalArgumentException](
      IvfPq.remove(victims, "id", p))
    assert(e.getMessage.contains("half-applied"))
    java.nio.file.Files.delete(marker)
  }

  test("TableServices.dedupExact on a MOR table: duplicates leave via " +
      "tombstones, survivors follow keep-min, second pass is a no-op") {
    import graft.core.{GraftTable, TableConfig, TableServices}
    val root = tmp("tdedup") + "/t"
    val t = GraftTable.create(spark, root,
      TableConfig(name = "tdedup", keyField = "id", orderingField = "id",
        tableType = TableConfig.Mor, numBuckets = 2))
    t.bulkInsert(Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "gamma"),
      (5L, "beta"), (6L, "alpha")).toDF("id", "text"))
    assert(TableServices.dedupExact(t, "text") == 3L)
    assert(t.read().select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
    assert(TableServices.dedupExact(t, "text") == 0L)
    // the curation rides the timeline: time travel shows the
    // pre-curation state
    val instants = t.log.commits().map(_.instant)
    assert(t.read(asOf = Some(instants.head)).count() == 6L)
  }

  test("mixtureWeights: budgets sum exactly, temperature upweights the " +
      "small source, guards are loud") {
    import graft.operators.Selection
    val docs = Seq(
      (1L, "big", 9000L), (2L, "big", 7000L), (3L, "big", 8000L),
      (4L, "mid", 4000L), (5L, "mid", 2000L),
      (6L, "tiny", 100L)
    ).toDF("doc_id", "source", "n_chars")
    val got = Selection.mixtureWeights(docs, "source", "n_chars",
        totalBudget = 1000003L, alpha = 0.5)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(got.values.map(_._2).sum == 1000003L, "budget must apportion exactly")
    // α = 0.5: sampling RATE (budget/size) must be strictly higher for
    // smaller sources — the whole point of temperature mixing
    val rate = got.view.mapValues { case (size, b) => b.toDouble / size }.toMap
    assert(rate("tiny") > rate("mid") && rate("mid") > rate("big"),
      s"temperature must upweight small sources: $rate")
    // α = 1 is proportional: rates equalize (within the integer floor)
    val prop = Selection.mixtureWeights(docs, "source", "n_chars",
        totalBudget = 1000000L, alpha = 1.0)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4.toDouble / r._2)).toMap
    assert(prop.values.max / prop.values.min < 1.001,
      s"alpha=1 must be proportional: $prop")
    // guards
    intercept[IllegalArgumentException](Selection.mixtureWeights(
      docs.limit(0), "source", "n_chars", 100L))
    intercept[IllegalArgumentException](Selection.mixtureWeights(
      docs, "source", "n_chars", 100L, alpha = 0.0))
    intercept[IllegalArgumentException](Selection.mixtureWeights(
      docs.withColumn("n_chars", lit(1L << 60)), "source", "n_chars", 100L))
  }

  test("unigram radix guard: a word of >= 1024 letters is unsegmentable " +
      "(null) and DROPPED from encodeStats in both engines' semantics") {
    import graft.operators.Unigram
    val long = "a" * 1100
    val docs = Seq(
      (1L, s"hello world $long"),
      (2L, "hello world")
    ).toDF("doc_id", "text")
    val got = Unigram.encodeStats(docs, "doc_id", "text",
        topK = 16, maxPieceLen = 4)
      .select($"doc_id", $"n_words").as[(Long, Long)].collect().toMap
    // the long word vanishes from doc 1's stats; short words unaffected
    assert(got(1L) == 2L)
    assert(got(2L) == 2L)
    // and the segmenter returns null pieces for it
    val learned = Unigram.learn(docs, "text", vocabSize = 16, emRounds = 0)
    val seg = Unigram.segmentWords(Seq(long, "hello").toDF("w"), "w", learned)
      .select($"w", $"pieces").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(seg(long), "long word must segment to null")
    assert(!seg("hello"), "short word must still segment")
  }
}
