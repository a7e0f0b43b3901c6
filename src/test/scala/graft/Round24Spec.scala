package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-24 claims, part 1: ExactSubstr excision
  * ([[Dedup.exactSubstrExcise]] — Lee et al. '22 keep-first duplicated-
  * span removal, the cutting half of the p55 sharedSpanPairs family).
  *
  * Planted corpus (L = 5 token windows):
  *  - docs 1 and 2 share a verbatim 8-token run ("s1..s8") embedded in
  *    otherwise-unique text → doc 1 (smaller id) keeps it, doc 2 loses
  *    exactly those 8 tokens;
  *  - doc 3 repeats its own 6-token run ("r1..r6") twice (INTRA-doc) →
  *    the second copy is excised, the first kept;
  *  - doc 4 is shorter than L → untouched, absent from output;
  *  - doc 5 shares nothing → absent from output.
  */
class Round24Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  private val shared = toks("s", 8)
  private val run    = toks("r", 6)

  private def corpus: DataFrame = Seq(
    (1L, (toks("a", 6) ++ shared ++ toks("b", 6)).mkString(" ")),
    (2L, (toks("c", 6) ++ shared ++ toks("d", 6)).mkString(" ")),
    (3L, (run ++ toks("e", 7) ++ run ++ toks("f", 7)).mkString(" ")),
    (4L, toks("g", 4).mkString(" ")),
    (5L, toks("h", 30).mkString(" "))
  ).toDF("doc_id", "text")

  private def excised: Map[Long, (Long, Long, Long, String)] =
    Dedup.exactSubstrExcise(corpus, "doc_id", "text", windowTokens = 5)
      .select($"doc_id", $"n_tokens", $"removed_tokens", $"n_spans",
        $"cleaned_text")
      .as[(Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("keep-first: the smaller doc id keeps the shared run, the larger " +
      "loses exactly those tokens; untouched docs are absent") {
    val out = excised
    assert(!out.contains(1L), "first occurrence must keep its text")
    assert(!out.contains(4L) && !out.contains(5L))
    val (n2, rm2, sp2, t2) = out(2L)
    assert(n2 == 20 && rm2 == 8 && sp2 == 1)
    assert(t2 == (toks("c", 6) ++ toks("d", 6)).mkString(" "))
  }

  test("intra-doc repetition: the second copy of a repeated run is " +
      "excised, the first kept") {
    val (n3, rm3, sp3, t3) = excised(3L)
    assert(n3 == 26 && rm3 == 6 && sp3 == 1)
    assert(t3 ==
      (run ++ toks("e", 7) ++ toks("f", 7)).mkString(" "))
  }

  test("overlapping flagged windows merge into one maximal span " +
      "(removed == n_tokens - |cleaned|) and a full-dup doc cleans to " +
      "the empty string") {
    // doc 11 keeps; docs 12/13 are byte-identical 12-token copies —
    // every one of their 8 windows is flagged, which must merge to ONE
    // span covering all 12 tokens.
    val dups = Seq(
      (11L, toks("x", 12).mkString(" ")),
      (12L, toks("x", 12).mkString(" ")),
      (13L, toks("x", 12).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrExcise(dups, "doc_id", "text", 5)
      .select($"doc_id", $"n_tokens", $"removed_tokens", $"n_spans",
        $"cleaned_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(12L, 13L))
    out.values.foreach { case (n, rm, sp, t) =>
      assert(n == 12 && rm == 12 && sp == 1 && t == "")
    }
  }

  test("disjoint duplicated runs in one doc yield separate spans") {
    // doc 22 duplicates doc 21's two runs, separated by unique filler
    // wider than one window — two spans, not one.
    val a = toks("p", 6); val b = toks("q", 6)
    val two = Seq(
      (21L, (a ++ toks("u", 10) ++ b).mkString(" ")),
      (22L, (a ++ toks("v", 10) ++ b).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrExcise(two, "doc_id", "text", 5)
      .select($"doc_id", $"removed_tokens", $"n_spans", $"cleaned_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 1)
    val (id, rm, sp, t) = (out(0)._1, out(0)._2, out(0)._3, out(0)._4)
    assert(id == 22L && rm == 12 && sp == 2)
    assert(t == toks("v", 10).mkString(" "))
  }

  // ---- Delta checkpoint write / checkpoint-aware replay ---------------

  import java.nio.file.{Files, Paths}
  import graft.interop.XTableSync

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r24-$tag-").toString

  /** Synthesize a two-version foreign Delta table: v0 adds old.parquet,
    * v1 removes it and adds a.parquet (the Round22Spec fixture). */
  private def foreignDelta(root: String): Unit = {
    Files.createDirectories(Paths.get(root, "_delta_log"))
    def writeFile(name: String, rows: Seq[(Long, Long, Double)]): Long = {
      val tmpd = s"$root/.tmp"
      rows.toDF("id", "ts", "score").coalesce(1).write.mode("overwrite")
        .parquet(tmpd)
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
    w(0L, Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta,
      s"""{"add":{"path":"old.parquet","partitionValues":{},"size":$s0,"modificationTime":1,"dataChange":true}}"""))
    w(1L, Seq(
      """{"remove":{"path":"old.parquet","dataChange":true,"deletionTimestamp":2}}""",
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$s1,"modificationTime":2,"dataChange":true}}"""))
  }

  test("checkpointDelta + expireDeltaLog: replay equals the full-chain " +
      "replay, and a retention-cleaned foreign table still ADOPTS") {
    val root = tmp("cp") + "/dsrc"
    foreignDelta(root)
    val before = XTableSync.replayDelta(root).liveFiles.toSet
    val v = XTableSync.checkpointDelta(spark, root)
    assert(v == 1L)
    // checkpoint-aware replay agrees with the JSON chain while both exist
    assert(XTableSync.replayDelta(root, spark).liveFiles.toSet == before)
    val expired = XTableSync.expireDeltaLog(root)
    assert(expired == Seq(0L, 1L))
    // JSON-only replay now refuses (needs the checkpoint), loudly
    val e = intercept[IllegalArgumentException](XTableSync.replayDelta(root))
    assert(e.getMessage.contains("needs a SparkSession"))
    // checkpoint-seeded replay reconstructs the same live set
    assert(XTableSync.replayDelta(root, spark).liveFiles.toSet == before)
    // and the retention-cleaned table adopts: live rows survive, the
    // continued log replays to the graft snapshot after a post-adoption
    // upsert + sync
    val t = XTableSync.adoptDelta(spark, root,
      graft.core.TableConfig(name = "adopted_cp", keyField = "id",
        orderingField = "ts", numBuckets = 1))
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "ts", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(state(t.read()) == Set((1L, 2L, 1.0), (2L, 2L, 2.0)))
    t.upsert(Seq((2L, 3L, 9.0), (3L, 3L, 3.0)).toDF("id", "ts", "score"))
    XTableSync.syncDelta(t)
    assert(state(XTableSync.readDelta(spark, root)) == state(t.read()))
  }

  test("unsound _delta_log shapes are refused loudly: version gaps, " +
      "incomplete multi-part debris ignored, _last_checkpoint naming a " +
      "missing checkpoint, expire without a checkpoint") {
    val root = tmp("bad") + "/dsrc"
    foreignDelta(root)
    // expire before any checkpoint exists
    val e0 = intercept[IllegalArgumentException](
      XTableSync.expireDeltaLog(root))
    assert(e0.getMessage.contains("no _last_checkpoint"))
    // gap: delete v0 with no covering checkpoint
    Files.delete(Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    val e1 = intercept[IllegalArgumentException](XTableSync.replayDelta(root))
    assert(e1.getMessage.contains("missing version 0"))
    // an INCOMPLETE multi-part set (part 1-of-2 only) not named by
    // _last_checkpoint is a crashed writer's debris: ignored, replay
    // proceeds from the JSON chain (complete sets are READ — Round26Spec)
    val root2 = tmp("mp") + "/dsrc"
    foreignDelta(root2)
    Files.write(Paths.get(root2, "_delta_log",
      f"${1L}%020d.checkpoint.0000000001.0000000002.parquet"), Array[Byte]())
    assert(XTableSync.replayDelta(root2, spark).liveFiles.nonEmpty)
    // _last_checkpoint pointing at a version with no complete checkpoint
    val root3 = tmp("lc") + "/dsrc"
    foreignDelta(root3)
    Files.writeString(Paths.get(root3, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""")
    val e3 = intercept[IllegalArgumentException](
      XTableSync.replayDelta(root3, spark))
    assert(e3.getMessage.contains("no complete checkpoint"))
  }

  test("expireIcebergMetadata keeps the newest versions' manifest " +
      "chains intact and deletes the rest") {
    val root = tmp("iceexp") + "/t"
    val t = graft.core.GraftTable.create(spark, root,
      graft.core.TableConfig(name = "iceexp", keyField = "id",
        orderingField = "ts", numBuckets = 1))
    (1 to 3).foreach { i =>
      t.upsert(Seq((i.toLong, i.toLong, i * 1.0)).toDF("id", "ts", "score"))
      XTableSync.syncIceberg(t)
    }
    val metaDir = Paths.get(root, "metadata")
    def metaVersions() = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq)
      .filter(_.matches("^v\\d+\\.metadata\\.json$")).sorted
    def avroCount() = graft.util.Fs.list(metaDir)(
      _.map(_.getFileName.toString).toSeq).count(_.endsWith(".avro"))
    assert(metaVersions().size == 3)
    val avrosBefore = avroCount()
    // keepVersions >= present versions: no-op
    assert(XTableSync.expireIcebergMetadata(root, keepVersions = 3).isEmpty)
    val before = XTableSync.readIceberg(spark, root)
      .select("id", "ts", "score").collect().toSet
    val deleted = XTableSync.expireIcebergMetadata(root, keepVersions = 1)
    assert(deleted.nonEmpty)
    assert(metaVersions().size == 1)
    assert(avroCount() < avrosBefore, "old manifest chains must be deleted")
    // the kept head still resolves its full chain — an Iceberg reader
    // reproduces the same rows, and the engine keeps writing
    assert(XTableSync.readIceberg(spark, root)
      .select("id", "ts", "score").collect().toSet == before)
    t.upsert(Seq((4L, 4L, 4.0)).toDF("id", "ts", "score"))
    XTableSync.syncIceberg(t)
    assert(metaVersions().size == 2)
    assert(XTableSync.readIceberg(spark, root).count() == 4)
    // the guard: keeping zero versions is refused
    intercept[IllegalArgumentException](
      XTableSync.expireIcebergMetadata(root, keepVersions = 0))
  }

  test("CALL expire_metadata checkpoints + expires both xTable targets " +
      "and foreign mounts survive") {
    import graft.sql.{GraftCatalog, GraftSql}
    val catalog = new GraftCatalog(spark,
      graft.util.TempDirs.create("graft-wh-r24-").toString)
    val gsql = new GraftSql(catalog)
    gsql.sql("""CREATE TABLE exm (id BIGINT, ts BIGINT, v STRING)
      USING GRAFT OPTIONS (primaryKey='id', precombine='ts')""")
    (1 to 3).foreach { i =>
      gsql.sql(s"INSERT INTO exm VALUES ($i, $i, 'v$i')")
      gsql.sql("CALL sync_xtable(table => 'exm', format => 'all')")
    }
    val root = Paths.get(catalog.warehouseDir, "exm")
    val removed = gsql.sql(
        "CALL expire_metadata(table => 'exm', format => 'all', keep => 1)")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(removed.exists(_._1 == "delta") && removed.exists(_._1 == "iceberg"),
      removed.mkString(", "))
    // both targets still mount: delta from the checkpoint, iceberg from
    // the kept head's intact manifest chain
    assert(XTableSync.readDelta(spark, root.toString).count() == 3)
    assert(XTableSync.readIceberg(spark, root.toString).count() == 3)
    assert(Files.exists(root.resolve("_delta_log/_last_checkpoint")))
    // idempotent: nothing left to expire
    assert(gsql.sql(
      "CALL expire_metadata(table => 'exm', format => 'all', keep => 1)")
      .count() == 0)
  }

  test("readDelta VERSION AS OF replays each exported version; expired " +
      "pre-checkpoint history refuses loudly") {
    val root = tmp("asof") + "/t"
    val t = graft.core.GraftTable.create(spark, root,
      graft.core.TableConfig(name = "asof", keyField = "id",
        orderingField = "ts", numBuckets = 1))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    (1 to 3).foreach { i =>
      t.upsert(Seq((i.toLong, i.toLong, i * 1.0)).toDF("id", "ts", "score"))
      XTableSync.syncDelta(t)
    }
    // one version per upsert commit: v0..v2
    assert(ids(XTableSync.readDelta(spark, root, 0L)) == Set(1L))
    assert(ids(XTableSync.readDelta(spark, root, 1L)) == Set(1L, 2L))
    assert(ids(XTableSync.readDelta(spark, root, 2L)) == Set(1L, 2L, 3L))
    // past the head: refused
    intercept[IllegalArgumentException](
      XTableSync.readDelta(spark, root, 9L))
    // checkpoint at head; while JSONs remain, old versions still read
    XTableSync.checkpointDelta(spark, root)
    assert(ids(XTableSync.readDelta(spark, root, 1L)) == Set(1L, 2L))
    // after retention, pre-checkpoint history is gone — loudly
    XTableSync.expireDeltaLog(root)
    val e = intercept[IllegalArgumentException](
      XTableSync.readDelta(spark, root, 1L))
    assert(e.getMessage.contains("retention-expired"))
    // the checkpointed head still reads
    assert(ids(XTableSync.readDelta(spark, root, 2L)) == Set(1L, 2L, 3L))
    // superseded checkpoints keep serving: two more commits, a NEW
    // checkpoint at the head, retention keeping the newest 2 JSONs —
    // a version between the checkpoints reconstructs from the OLD
    // checkpoint parquet plus the surviving JSON (the real-Delta
    // any-checkpoint-≤-V rule)
    (4 to 5).foreach { i =>
      t.upsert(Seq((i.toLong, i.toLong, i * 1.0)).toDF("id", "ts", "score"))
      XTableSync.syncDelta(t)
    }
    XTableSync.checkpointDelta(spark, root) // checkpoint at v4
    XTableSync.expireDeltaLog(root, keepVersions = 2) // keeps v3, v4
    assert(ids(XTableSync.readDelta(spark, root, 3L)) == Set(1L, 2L, 3L, 4L))
    assert(ids(XTableSync.readDelta(spark, root, 4L)) == (1L to 5L).toSet)
    // but a version no surviving checkpoint+JSON chain covers is gone
    intercept[IllegalArgumentException](
      XTableSync.readDelta(spark, root, 1L))
  }

  test("IvfPq.topKRerank: exact refine over ADC candidates equals " +
      "brute-force inner product and beats raw ADC under lossy codes") {
    import graft.operators.IvfPq
    val rnd = new scala.util.Random(11)
    val base = (1L to 48L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "embedding")
    val p = tmp("rerank") + "/idx"
    // aggressively lossy: 2 subspaces × 4 codes for 48 vectors
    val cb = IvfPq.build(base, "id", "embedding", nLists = 2, m = 2,
      codesPerSub = 4, path = p)
    val q = Array.fill(8)(rnd.nextGaussian())
    def dot(v: Seq[Double]) = v.zip(q).map { case (a, b) => a * b }.sum
    val exact = base.as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, dot(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val rr = IvfPq.topKRerank(spark, p, cb, q, k = 5, nProbe = 2,
        candidates = 48)
      .select("id").as[Long].collect().toSeq
    assert(rr == exact, s"rerank $rr != exact $exact")
    // raw ADC under these code budgets must be strictly worse or equal
    val adc = IvfPq.topK(spark, p, cb, q, k = 5, nProbe = 2)
      .select("id").as[Long].collect().toSet
    assert((rr.toSet & exact.toSet).size >= (adc & exact.toSet).size)
    // candidates < k refused
    intercept[IllegalArgumentException](
      IvfPq.topKRerank(spark, p, cb, q, k = 5, nProbe = 2, candidates = 3))
  }

  // ---- streaming incremental SemDeDup ---------------------------------

  import graft.operators.{IncrementalSemanticDedup, SemanticDedup}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
    StructField, StructType}

  private val dim = 16
  private val threshold = 0.95

  /** The Round23Spec corpus: 40 near-orthogonal unit vectors, a tight
    * duplicate for every 4th, a second for every 8th. */
  private def semCorpus: org.apache.spark.sql.DataFrame = {
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

  test("dedupStream: micro-batched semantic dedup equals the batch " +
      "operator; a reset checkpoint is refused; baseBatchNo resumes") {
    val c = semCorpus.cache(); c.count()
    val inc = new IncrementalSemanticDedup(spark, tmp("stream"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")

    // one JSON file per micro-batch, interleaved like Round23Spec
    val in = tmp("semin")
    def writeBatch(name: String, rows: Seq[(Long, Seq[Double])]): Unit =
      Files.write(Paths.get(in, name),
        rows.map { case (id, v) =>
          s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
        }.mkString("\n").getBytes("UTF-8"))
    val all = c.select($"vec_id", $"embedding")
      .as[(Long, Seq[Double])].collect().toSeq
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val ckpt = tmp("semckpt")
    def start(dir: String, base: Long = 0L) = inc.dedupStream(
      spark.readStream.schema(schema).json(in),
      "vec_id", "embedding", checkpointDir = dir, baseBatchNo = base)

    writeBatch("b0.json", all.filter(_._1 % 3 == 0))
    val q = start(ckpt)
    try {
      q.processAllAvailable()
      writeBatch("b1.json", all.filter(_._1 % 3 == 1))
      q.processAllAvailable()
      writeBatch("b2.json", all.filter(_._1 % 3 == 2))
      q.processAllAvailable()
    } finally q.stop()

    // verdict-store groups equal the batch operator's on the union
    val batchV = SemanticDedup.verdicts(c, "vec_id", "embedding",
      nClusters = 8, threshold = threshold, indexPath = tmp("bidx"))
    val expGroups = batchV.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    def gotGroups() = inc.verdictStore.read()
      .select(col("vec_id").cast("long"), col("group_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(expGroups.nonEmpty && gotGroups() == expGroups)
    val membersBefore = inc.members.read().count()

    // restarting from the SAME checkpoint replays nothing: state holds
    val q2 = start(ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(gotGroups() == expGroups && inc.members.read().count() == membersBefore)

    // a RESET checkpoint restarts epochs at 0 — refused loudly, state
    // untouched
    val q3 = start(tmp("reset"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(ex.getMessage.contains("monotone"))
    assert(gotGroups() == expGroups && inc.members.read().count() == membersBefore)

    // NEW data resumes under baseBatchNo above the high-water mark: a
    // tight duplicate of doc 2 arrives and is grouped with it
    val in2 = in + "2"
    val v2 = all.find(_._1 == 2L).get._2
    Files.createDirectories(Paths.get(in2))
    Files.write(Paths.get(in2, "late.json"),
      s"""{"vec_id":3002,"embedding":[${v2.mkString(",")}]}"""
        .getBytes("UTF-8"))
    val q4 = inc.dedupStream(
      spark.readStream.schema(schema).json(in2),
      "vec_id", "embedding", checkpointDir = tmp("ck2"), baseBatchNo = 10L)
    try q4.processAllAvailable() finally q4.stop()
    val g = gotGroups()
    assert(g.get(3002L).contains(2L), s"late duplicate not grouped: $g")
    assert(inc.survivors().filter($"vec_id" === 3002L).count() == 0,
      "late duplicate of a released doc must not survive")
    c.unpersist()
  }

  // ---- unigram-LM tokenizer -------------------------------------------

  import graft.operators.Unigram

  test("Unigram.learn: hard-EM reallocates mass to whole-word pieces, " +
      "keeps characters segmentable, and is deterministic") {
    // 9 seed pieces (a b ab · c d cd · x q xq); vocabSize must keep all
    // — at 8 the tie-broken last piece "xq" would be cut before EM ever
    // sees it (seed order: cnt desc, piece asc)
    val docs = Seq((1L, "ab ab ab"), (2L, "cd cd xq")).toDF("doc_id", "text")
    def learned() = Unigram.learn(docs, "text", vocabSize = 12,
        emRounds = 2, maxPieceLen = 4)
      .as[(String, Long)].collect().toSeq
    val v = learned()
    val m = v.toMap
    // whole words won the corpus: "ab" carries its full frequency, and
    // the n_pieces tie-break made single-piece segmentations canonical
    assert(m.get("ab").contains(3L), s"vocab: $v")
    assert(m.get("cd").contains(2L) && m.get("xq").contains(1L))
    // characters survive with the floor count even when unused
    Seq("a", "b", "c", "d", "x", "q").foreach(c =>
      assert(m.get(c).contains(1L), s"char $c lost from $v"))
    // determinism: the EM is pure integer/floored arithmetic
    assert(learned() == v)
    // segmentation under the learned vocab: known words are single
    // pieces, a novel concatenation decomposes, a foreign char is null
    val segs = Unigram.segmentWords(
        Seq("ab", "abcd", "zzz").toDF("w"), "w", Unigram.learn(
          docs, "text", vocabSize = 12, emRounds = 2, maxPieceLen = 4))
      .select($"w", $"pieces").as[(String, Option[Seq[String]])]
      .collect().toMap
    assert(segs("ab").contains(Seq("ab")))
    assert(segs("abcd").contains(Seq("ab", "cd")))
    assert(segs("zzz").isEmpty, "a word with unseen chars must yield null")
  }

  test("Unigram.encodeStats: n_pieces bounds, cost positivity, and " +
      "word-count reconciliation on the fixture corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Unigram.encodeStats(docs, "doc_id", "text", topK = 256)
      .persist()
    try {
      assert(out.count() > 0)
      // every word yields at least one piece and costs are positive
      assert(out.filter($"n_pieces" < $"n_words").count() == 0)
      assert(out.filter($"cost_micronats" <= 0).count() == 0)
      // n_words reconciles with a direct count
      val direct = docs.select($"doc_id", size(expr(
          "regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long")
        .as("nw")).filter($"nw" > 0)
      assert(out.join(direct, Seq("doc_id"))
        .filter($"n_words" =!= $"nw").count() == 0)
    } finally { out.unpersist(); () }
  }

  // ---- MMR diversity selection ------------------------------------------

  test("mmrSelect: diversity term suppresses near-duplicates of picks, " +
      "k past the candidate count exhausts gracefully, runs are " +
      "deterministic") {
    import graft.operators.Similarity
    // candidates 1 and 2 are near-duplicates of each other and both
    // highly query-relevant; 3 is weakly relevant but diverse. Pure
    // relevance ranks (2, 1); MMR must rank (2, 3): pick 1's diversity
    // penalty vs 2 (cos ≈ 0.995) swamps its relevance edge over 3.
    val cands = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.99, 0.1, 0.0)),
      (3L, Seq(-0.1, 1.0, 0.2))
    ).toDF("vec_id", "embedding")
    val q = Array(0.9, 0.3, 0.32)
    def run(k: Int) = Similarity
      .mmrSelect(cands, "vec_id", "embedding", q, k)
      .select($"rank", $"vec_id").as[(Long, Long)].collect().toSeq
    assert(run(2) == Seq((1L, 2L), (2L, 3L)))
    // k beyond the candidate count returns every candidate once
    assert(run(5).map(_._2).sorted == Seq(1L, 2L, 3L))
    assert(run(2) == run(2))
  }

  // ---- balanced shards --------------------------------------------------

  test("balancedShards: every doc assigned once, per-shard token mass " +
      "within a few percent of even, deterministic") {
    import graft.operators.Curation
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    def run() = Curation.balancedShards(docs, "doc_id", "n_tokens",
      shards = 4, salts = 8)
    val out = run().persist()
    try {
      assert(out.count() == docs.count())
      assert(out.select("doc_id").distinct().count() == docs.count())
      assert(out.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
      val totals = out.groupBy("shard").agg(sum("n_tokens").as("t"))
        .select("t").as[Long].collect()
      assert(totals.length == 4)
      val (mx, mn) = (totals.max.toDouble, totals.min.toDouble)
      assert((mx - mn) / mx < 0.05,
        s"shard token totals spread ${(mx - mn) / mx}: ${totals.toSeq}")
      // deterministic
      assert(run().select("doc_id", "shard").as[(Long, Long)].collect().toSet ==
        out.select("doc_id", "shard").as[(Long, Long)].collect().toSet)
    } finally { out.unpersist(); () }
  }

  // ---- perceptron training ----------------------------------------------

  test("trainPerceptron: converges on a separable corpus, the learned " +
      "weights classify the training set, and runs are deterministic") {
    import graft.operators.Selection
    // two disjoint vocabularies — linearly separable by construction
    val docs = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, "good clean prose text here", 1L)
      else (i, "zzz qqq xxx jjj vvv", -1L)
    }.toDF("doc_id", "text", "y")
    def fit() = Selection.trainPerceptron(docs, "doc_id", "text",
      col("y"), dim = 64, epochs = 10)
    val f = fit()
    // converged: a zero-error epoch appears and training stops there
    assert(f.errorsPerEpoch.last == 0L, f.errorsPerEpoch.toString)
    assert(f.errorsPerEpoch.length < 10, "separable corpus must stop early")
    assert(f.errorsPerEpoch.head > 0L)
    // the learned weights classify every training doc (margin recomputed
    // here with the same md5 bucketing, independently of Spark)
    def margin(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val terms = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      val m = terms.map { t =>
        val hex = md.digest(t.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        f.weights(((java.lang.Long.parseLong(hex, 16)) % 64).toInt)
      }.sum
      m + f.weights(64) // bias
    }
    assert(margin("good clean prose text here") > 0L)
    assert(margin("zzz qqq xxx jjj vvv") < 0L)
    // deterministic
    assert(fit().weights.toSeq == f.weights.toSeq)
  }

  // ---- Gopher rule battery --------------------------------------------

  test("Curation.gopherRules: each rule trips on its planted violation " +
      "and a clean doc passes everything") {
    import graft.operators.Curation
    val good = (("the of and " * 20) + ("sensible words here " * 10)).trim
    val docs = Seq(
      (1L, good), // passes all six
      (2L, "the of " + ("w " * 10).trim), // word count < 50
      (3L, ("the of and " * 20 + "a b c d " * 30).trim), // mean len < 3
      (4L, (("the of and " * 20) + ("### " * 20)).trim), // symbols + alpha
      (5L, (1 to 60).map(i => s"- the of and bullet $i").mkString("\n")),
      (6L, good + " " + ("42 17 99 " * 40).trim) // alpha ratio < 0.8
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, f: String) =
      out(id).getBoolean(out(id).fieldIndex(f))
    assert(b(1L, "keep"), "clean doc must pass the battery")
    assert(!b(2L, "word_count_ok") && !b(2L, "keep"))
    assert(!b(3L, "mean_word_len_ok") && b(3L, "word_count_ok"))
    assert(!b(4L, "symbol_ratio_ok") && !b(4L, "alpha_ratio_ok"))
    assert(!b(5L, "bullet_ok"),
      "a doc of bullet lines must trip the bullet rule")
    assert(b(5L, "word_count_ok") && b(5L, "stopwords_ok"))
    assert(!b(6L, "alpha_ratio_ok") && b(6L, "symbol_ratio_ok"))
  }

  test("cleaned token count reconciles on the sf0.001 fixture corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Dedup.exactSubstrExcise(docs, "doc_id", "text", 20)
      .withColumn("kept",
        when(col("cleaned_text") === "", lit(0))
          .otherwise(size(split(col("cleaned_text"), " "))).cast("long"))
    assert(out.filter(col("kept") + col("removed_tokens") =!= col("n_tokens"))
      .count() == 0)
    // every output doc actually lost something
    assert(out.filter(col("removed_tokens") <= 0).count() == 0)
  }
}
