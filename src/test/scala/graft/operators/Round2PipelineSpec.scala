package graft.operators

import graft.Session
import graft.functions.LangId
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-2 pipeline work: auto-sized LSH reaching the exact answer,
  * the persisted IVF index (pruning + staleness + full-probe
  * exactness), and the planted-label lang-id fixture gate. */
class Round2PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def embs: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  test("auto LSH params scale bits with corpus size and tables with threshold") {
    val (l1, b1) = Similarity.lshAutoParams(500, 0.45)
    val (l2, b2) = Similarity.lshAutoParams(500000, 0.45)
    assert(b2 > b1)                  // bigger corpus → more buckets/table
    val (l3, _) = Similarity.lshAutoParams(500, 0.8)
    assert(l3 < l1)                  // stronger similarity → fewer tables
    assert(l1 > 0 && l2 > 0 && b1 >= 4)
  }

  test("lshCandidatePairs (auto) equals the exact all-pairs embedding dedup") {
    val exact = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshCandidatePairs(embs, "vec_id", "embedding",
        dim = 64, threshold = 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    // and the plan has no cross/all-pairs join: the only join condition
    // is bucket equality
    val plan = Similarity.lshCandidatePairs(embs, "vec_id", "embedding",
        dim = 64, threshold = 0.45).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cross"), "all-pairs join leaked into the LSH plan")
  }

  test("lshTopK (auto, full-recall) equals exact brute force") {
    val queries = embs.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val lsh = Similarity.lshTopK(embs, queries, "vec_id", "embedding", k = 5, dim = 64)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(lsh == exact)
  }

  test("IVF index: build once, partial probe prunes partitions, full probe is exact") {
    val path = graft.util.TempDirs.create("graft-ivf-test-").toString
    val nLists = 8
    val m = IvfIndex.build(embs, "vec_id", "embedding", nLists, path)
    assert(m.corpusCount == embs.count() && m.nLists == nLists)
    val queries = embs.filter($"vec_id" < 10)

    // partial probe: the assignments scan reads ONLY probed list dirs
    val partial = IvfIndex.topK(spark, path, queries, "vec_id", "embedding",
      k = 5, nProbe = 2)
    val scannedLists = partial.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("assignments")) =>
        s.relation.location.inputFiles
          .flatMap(_.split("/").find(_.startsWith("list=")))
          .map(_.stripPrefix("list=").toInt).toSet
    }.headOption
    // up to 10 queries × 2 probes distinct lists; must be < all lists
    assert(scannedLists.isEmpty || scannedLists.get.size < nLists,
      s"partition pruning failed: scanned $scannedLists of $nLists lists")
    assert(partial.count() > 0)

    // full probe reproduces exact brute force bit-for-bit
    val exact = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    val full = IvfIndex.topK(spark, path, queries, "vec_id", "embedding",
      k = 5, nProbe = nLists)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(full == exact)

    // staleness: same corpus → no rebuild; changed corpus → rebuild
    val metaBefore = Files.getLastModifiedTime(
      java.nio.file.Paths.get(path, "meta.json"))
    IvfIndex.buildIfStale(embs, "vec_id", "embedding", nLists, path)
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(path, "meta.json")) == metaBefore)
    IvfIndex.buildIfStale(embs.limit(50), "vec_id", "embedding", nLists, path)
    assert(IvfIndex.meta(path).get.corpusCount == 50)
    // column identity is part of the staleness key: same count under a
    // different id column must rebuild, not serve the old index
    val renamed = embs.limit(50).withColumnRenamed("vec_id", "vid")
    IvfIndex.buildIfStale(renamed, "vid", "embedding", nLists, path)
    assert(IvfIndex.meta(path).get.idCol == "vid")
  }

  test("lang-id fixture: every planted label is predicted exactly") {
    graft.PipelineQueries.langFixture.foreach { case (id, text, expected) =>
      val got = LangId.detect(text)
      assert(got == expected, s"sample $id: expected $expected got $got ($text)")
    }
  }

  test("multimodal decode is in-plan (no RDD boundary) over a parquet scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("img"))
    val out = Multimodal.withImageMeta(
      Multimodal.withThumbnailChecksum(docs, "img", 64), "img")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      "multimodal decode fell out of the plan into an RDD boundary")
    assert(plan.contains("Scan parquet") || plan.contains("FileScan"))
    // and the decode actually runs
    assert(out.filter(col("image_meta.corrupt")).count() >= 0)
    assert(out.select("thumb_checksum").distinct().count() > 1)
  }

  test("curation: deterministic sample is key-stable and near the target fraction") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val s1 = Curation.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Curation.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)                       // pure function of the key
    val frac = s1.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.4, s"fraction $frac")
    // a larger fraction strictly contains a smaller one (monotone)
    val s3 = Curation.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("curation: a full-fraction sample keeps every row") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(Curation.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Curation.hexThreshold(1.0) > "f" * 32) // above every md5 digest
    intercept[IllegalArgumentException](Curation.hexThreshold(1.2))
  }

  test("curation: stratified top-N yields exactly N per class (where available)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = Curation.stratifiedTopN(docs, "lang", "doc_id", 5)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    avail.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(5L, n))
    }
    // WindowGroupLimit prunes before the shuffle (O(N×classes) plan)
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("curation: normalizeText canonicalizes punctuation/case/whitespace") {
    val got = Seq("Hello,  WORLD!! 42").toDF("t")
      .select(Curation.normalizeText(col("t"))).as[String].head()
    assert(got == "hello world 42")
  }

  test("asofJoin attaches the latest right row at-or-before each left row") {
    val clicks = Seq((1L, 100L, 10L), (1L, 101L, 25L), (2L, 102L, 5L))
      .toDF("user", "id", "t")
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0))
      .toDF("user", "t", "px")
    val rows = Joins.asofJoin(clicks, quotes, Seq("user"), "t", Seq("px"))
      .select("id", "px_asof", "t_asof")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(rows == Set(
      (100L, Some(1.0), Some(10L)),   // t=10 matches quote at exactly 10 (<=)
      (101L, Some(2.0), Some(20L)),   // t=25 → quote at 20
      (102L, None, None)))            // user 2 has no quotes
  }

  test("asofJoin carries the whole matched row: a null value is not backfilled from an older row") {
    val clicks = Seq((1L, 200L, 50L)).toDF("user", "id", "t")
    val quotes = Seq((1L, 10L, Some(1.0)), (1L, 40L, None))
      .toDF("user", "t", "px")
    val row = Joins.asofJoin(clicks, quotes, Seq("user"), "t", Seq("px"))
      .select("t_asof", "px_asof").head()
    assert(row.getLong(0) == 40L)      // latest quote at-or-before t=50
    assert(row.isNullAt(1))            // ...whose px IS null — keep it null
  }

  test("rangeJoinBinned plans as an equi-join on bins, not a nested loop") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val bands = Seq((0.0, 100.0), (100.0, 1000.0)).toDF("lo", "hi")
    val joined = Joins.rangeJoinBinned(ev, "value", bands, "lo", "hi", 50.0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range join fell back to a nested loop")
    // matches the naive inequality-join result
    val naive = ev.join(bands,
      col("value") >= col("lo") && col("value") < col("hi")).count()
    assert(joined.count() == naive)
  }

  test("packSequences: offsets are a gapless token prefix sum, invariant to partitioning") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val packed = Curation.packSequences(docs, "doc_id", "text", targetTokens = 512)
      .orderBy("doc_id").collect()
    // offsets are the exclusive prefix sum of token counts in id order
    var expect = 0L
    packed.foreach { r =>
      assert(r.getAs[Long]("offset") == expect,
        s"doc ${r.get(0)}: offset ${r.getAs[Long]("offset")} != $expect")
      assert(r.getAs[Long]("window_id") == expect / 512)
      expect += r.getAs[Long]("n_tokens")
    }
    // a different partitioning yields identical offsets
    val repartitioned = Curation.packSequences(docs.repartition(7), "doc_id", "text", 512)
      .orderBy("doc_id").collect()
    assert(repartitioned.map(_.getAs[Long]("offset")).toSeq ==
      packed.map(_.getAs[Long]("offset")).toSeq)
  }

  test("p15 gate query runs and carries the dedup schema") {
    val out = graft.PipelineQueries.dEmbeddingLsh(spark, dir)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "cosine"))
    val exact = graft.PipelineQueries.dEmbedding(spark, dir)
    assert(out.collect().toSeq == exact.collect().toSeq)
  }
}
