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
      "multi-part checkpoints, _last_checkpoint naming a missing file, " +
      "expire without a checkpoint") {
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
    // multi-part checkpoint name
    val root2 = tmp("mp") + "/dsrc"
    foreignDelta(root2)
    Files.write(Paths.get(root2, "_delta_log",
      f"${1L}%020d.checkpoint.0000000001.0000000002.parquet"), Array[Byte]())
    val e2 = intercept[IllegalArgumentException](
      XTableSync.replayDelta(root2, spark))
    assert(e2.getMessage.contains("multi-part"))
    // _last_checkpoint pointing at a version with no checkpoint file
    val root3 = tmp("lc") + "/dsrc"
    foreignDelta(root3)
    Files.writeString(Paths.get(root3, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""")
    val e3 = intercept[IllegalArgumentException](
      XTableSync.replayDelta(root3, spark))
    assert(e3.getMessage.contains("missing"))
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
