package graft.operators

import graft.Session
import graft.functions.{GraftExpressions, LangId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the pipeline operators whose outputs aren't
  * SQL-expressible for the DuckDB oracle: language ID accuracy,
  * simhash/LSH recall against the exact operators, winnowing
  * fingerprints, multimodal decode plumbing.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  private def embs: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  test("lang_id detects real multilingual text") {
    // fixture sentences of function words; profiles derive from public
    // common-word knowledge, not from this data
    assert(LangId.detect("the cat is on the mat and it is happy that the day is warm") == "en")
    assert(LangId.detect("der hund und die katze sind mit dem kind in dem garten") == "de")
    assert(LangId.detect("le chien et le chat sont dans le jardin avec les enfants") == "fr")
    assert(LangId.detect("el perro y el gato están en el jardín con los niños de la casa") == "es")
    assert(LangId.detect("il cane e il gatto sono nel giardino con i bambini della casa") == "it")
    assert(LangId.detect("o cachorro e o gato estão no jardim com as crianças da casa") == "pt")
    assert(LangId.detect("今天天气很好我们一起去公园散步吧") == "zh")
    assert(LangId.detect("今日はいい天気ですから公園へさんぽに行きましょう") == "ja")
    assert(LangId.detect("오늘은 날씨가 좋아서 공원에 산책하러 갑니다") == "ko")
    assert(LangId.detect("") == "und")
    assert(LangId.detect("xyzzy qwfp 12345") == "und")
  }

  test("lang_id runs as a SQL function through the registry") {
    GraftExpressions.register(spark)
    docs.createOrReplaceTempView("docs_tmp")
    val n = spark.sql("select lang_id(text) as l from docs_tmp").count()
    assert(n == docs.count())
  }

  test("simhash finds the planted near-duplicates (recall vs exact jaccard)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8,
      requireComplete = false)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("p4 gate path: production simhashPairs with md5 parity fingerprint == all-pairs") {
    import graft.functions.TextFunctions
    val gated = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
      fingerprint = TextFunctions.simhashMd5_60, numBands = 4, bandBits = 15)
    // the operator's banded candidate join is in the executed plan
    // ("bsig" is simhashPairs's internal band-signature alias)
    assert(gated.queryExecution.analyzed.toString.contains("bsig"),
      "gate plan does not flow through Dedup.simhashPairs")
    val sigs = docs.select($"doc_id", TextFunctions.simhashMd5_60($"text").as("fp"))
    val allPairs = sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.fp".bitwiseXOR($"b.fp")).cast("long").as("hamming"))
      .filter($"hamming" <= 3)
      .as[(Long, Long, Long)].collect().toSet
    val got = gated.as[(Long, Long, Long)].collect().toSet
    assert(got == allPairs, "pigeonhole banding must equal the all-pairs answer")
  }

  test("minhash LSH equals exact jaccard pairs at its threshold") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", k = 5, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("LSH ANN recall vs brute force") {
    val queries = embs.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(embs, queries, "vec_id", "embedding", k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // 16 tables × 4 planes: P[hit] ≈ 1-(1-p^4)^16 ≈ 0.93 at cosine 0.4
    assert(recall >= 0.75, s"ANN recall $recall")
  }

  test("winnow fingerprints overlap heavily for near-dup docs, little for random") {
    GraftExpressions.register(spark)
    val fp = docs.select($"doc_id",
      GraftExpressions.winnow_fingerprint($"text").as("fp"))
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val fpMap = fp.as[(Long, Array[Long])].collect().toMap
    val (a, b) = pairs.head
    val (fa, fb) = (fpMap(a).toSet, fpMap(b).toSet)
    val overlap = fa.intersect(fb).size.toDouble / math.max(fa.size, fb.size)
    assert(overlap > 0.5, s"near-dup fingerprint overlap $overlap")
    // a random non-dup pair overlaps ~0
    val ids = fpMap.keySet -- Set(a, b)
    val (x, y) = (ids.min, ids.max)
    val (fx, fy) = (fpMap(x).toSet, fpMap(y).toSet)
    assert(fx.intersect(fy).size.toDouble / math.max(fx.size, fy.size) < 0.3)
  }

  test("multimodal: fake-codec metadata + thumbnail checksum through mapPartitions") {
    // synthesize binary "images" with the fake 5-byte header
    def img(fmt: Byte, w: Int, h: Int, payload: Int): Array[Byte] =
      Array[Byte](fmt, (w >> 8).toByte, (w & 0xff).toByte,
        (h >> 8).toByte, (h & 0xff).toByte) ++ Array.fill(payload)(0x7.toByte)
    val rows = Seq(
      (1L, img(1, 640, 480, 100)),
      (2L, img(2, 1024, 768, 200)),
      (3L, Array[Byte](9, 1)),     // corrupt: short + unknown format
      (4L, null))
    val df = rows.toDF("id", "img")
    val withMeta = Multimodal.withImageMeta(df, "img")
    val metas = withMeta.select($"id", $"image_meta.format", $"image_meta.width",
        $"image_meta.height", $"image_meta.corrupt")
      .as[(Long, String, Int, Int, Boolean)].collect().sortBy(_._1)
    assert(metas(0) == ((1L, "png", 640, 480, false)))
    assert(metas(1) == ((2L, "jpeg", 1024, 768, false)))
    assert(metas(2)._5 == true)
    assert(metas(3)._5 == true)
    val sums = Multimodal.withThumbnailChecksum(df.filter($"img".isNotNull), "img", 256)
      .select("thumb_checksum").as[Long].collect()
    assert(sums.distinct.length == 3) // deterministic, distinct per payload
    // frame sampling stub: one row per sampled index
    val frames = Multimodal.sampleFrameIndexes(df.filter($"id" === 1), "img", 50)
    assert(frames.count() == 3) // 105 bytes / 50 → indexes 0,1,2
  }

  test("IVF ANN recall vs brute force (label-informed centroids)") {
    val queries = embs.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embs, queries, "vec_id", "embedding",
      listCol = "label", k = 5, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("IVF build trains on a bounded sample; full probe still equals exact") {
    // 2000 vectors, nLists=4 → training budget 1024 < corpus: the
    // sampled-quantizer path runs; assignment still covers every row
    val n = 2000
    val vecs = spark.range(n).select($"id".as("vec_id"),
      array((0 until 8).map(d =>
        (hash($"id" * (d + 1)).cast("double") / Int.MaxValue)): _*).as("embedding"))
      .persist()
    val path = graft.util.TempDirs.create("graft-ivf-samp-").toString
    val meta = IvfIndex.build(vecs, "vec_id", "embedding", nLists = 4, path = path)
    assert(meta.corpusCount == n)
    // every corpus row is assigned exactly once
    assert(spark.read.parquet(s"$path/assignments").count() == n)
    // full probe (nProbe = nLists) ranks every corpus vector → exact
    val queries = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.topK(spark, path, queries, "vec_id", "embedding",
        k = 3, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == exact, "full-probe IVF must equal brute force")
    vecs.unpersist(); ()
  }

  test("native shingle_hashes equals the HOF formulation, values and order") {
    import graft.functions.TextFunctions
    // the real fixture plus adversarial edges: empty text, short docs
    // (< k tokens), repeated shingles, multiple/leading/trailing spaces
    // (split(' ', -1) keeps empty tokens — the native path must too)
    val edges = Seq("", "one", "a b c", "x x x x x x x x",
      "a  b c", " lead", "trail ", "a b c d e a b c d e a b c d e")
      .toDF("text")
    for ((df, col) <- Seq((docs, "text"), (edges, "text")); k <- Seq(1, 5)) {
      val cmp = df.select(
        TextFunctions.shingleHashes(expr(col), k).as("native"),
        TextFunctions.shingleHashesHof(expr(col), k).as("hof"))
      val bad = cmp.filter(!($"native" <=> $"hof"))
      assert(bad.count() == 0,
        s"k=$k: native shingle hashes diverged from the HOF tree")
    }
  }

  test("native cosine_sim is bit-identical to the HOF fold formulation") {
    import graft.functions.VectorFunctions
    // random float vectors, incl. a zero vector (NaN both ways) and
    // mismatched lengths / nulls (null both ways)
    val vecs = spark.range(500).select($"id",
      array((0 until 64).map(d =>
        (hash($"id" * (d + 3)).cast("float") / Int.MaxValue)): _*).as("v"))
    val pairs = vecs.toDF("ia", "va").crossJoin(
        vecs.toDF("ib", "vb").limit(20))
      .withColumn("native", VectorFunctions.cosine($"va", $"vb"))
      .withColumn("hof", VectorFunctions.cosineHof($"va", $"vb"))
    // bit-level comparison: NaN == NaN under <=> after double bits
    val diff = pairs.filter(
      !(expr("cast(native as double)") <=> expr("cast(hof as double)")))
    assert(diff.count() == 0, "native cosine diverged from the HOF fold")

    // null / length-mismatch semantics match the zip_with null-pad rule
    val odd = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)), // mismatched lengths
      (Seq(1.0f, 2.0f), null)                   // null side
    ).toDF("a", "b")
      .withColumn("native", VectorFunctions.cosine($"a", $"b"))
    assert(odd.filter($"native".isNotNull).count() == 0)
  }

  test("IVF warm staleness check with a metadata count runs zero Spark jobs") {
    val vecs = spark.range(100).select($"id".as("vec_id"),
      array((0 until 8).map(d =>
        (hash($"id" * (d + 1)).cast("double") / Int.MaxValue)): _*).as("embedding"))
    val path = graft.util.TempDirs.create("graft-ivf-warm-").toString
    val built = IvfIndex.build(vecs, "vec_id", "embedding", nLists = 4, path = path)

    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    try {
      // warm check with the caller-supplied metadata count: must be
      // pure driver-side meta.json IO — the raw-DataFrame path paid an
      // embs.count() corpus scan here before round 6
      val m = IvfIndex.buildIfStale(vecs, "vec_id", "embedding",
        nLists = 4, path = path, corpusCount = 100L)
      assert(m == built)
      // flush the async listener bus with a marker action, then assert
      // the warm check itself contributed nothing
      spark.range(1).count()
      val deadline = System.currentTimeMillis() + 10000
      while (!actions.contains("count") && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val seen = actions.toArray(Array.empty[String]).toSeq
      assert(seen == Seq("count"),
        s"warm staleness check must run zero jobs, saw: $seen")
    } finally spark.listenerManager.unregister(qel)

    // the fallback (no metadata count) still detects drift: a changed
    // corpus count rebuilds
    val grown = spark.range(150).select($"id".as("vec_id"),
      array((0 until 8).map(d =>
        (hash($"id" * (d + 1)).cast("double") / Int.MaxValue)): _*).as("embedding"))
    val m2 = IvfIndex.buildIfStale(grown, "vec_id", "embedding",
      nLists = 4, path = path)
    assert(m2.corpusCount == 150L)
  }

  test("connected components cluster transitive near-dup pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)      // chain 1-2-3
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(Set(20L, 21L, 22L, 23L).forall(cc(_) == 20L))      // longer chain
  }

  test("connected components run one job per iteration (no separate convergence count)") {
    // chain 1-2-3-4 converges in 2 pointer-jumping rounds (one that
    // moves every label to 1, one that confirms convergence); the
    // accumulator-folded convergence check means the loop costs exactly
    // one foreach job per round — the old old-vs-new join + count()
    // shape paid two full label scans per round.
    // raw job counts are noisy (AQE stages, broadcast builds), so count
    // Dataset ACTIONS: the loop must be exactly one `foreach` per
    // propagation round and ZERO `count` actions
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    val cc = try {
      val out = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      // listener delivery is async; wait for the final collect to land
      val deadline = System.currentTimeMillis() + 10000
      while (!actions.contains("collect") && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      out
    } finally spark.listenerManager.unregister(qel)
    assert(Set(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    val byName = actions.toArray(Array.empty[String]).groupBy(identity)
    assert(!byName.contains("count"),
      s"convergence must not run count() jobs, saw actions: ${byName.keySet}")
    // chain 1-2-3-4: relax collapses 1-2-3 and the jump drags 4 along
    // in the SAME round → 2 rounds → exactly 2 foreach actions
    // (Dataset.foreach surfaces to the listener as foreachPartition)
    assert(byName.getOrElse("foreachPartition", Array.empty).length == 2,
      s"expected 2 foreach rounds, saw: ${byName.view.mapValues(_.length).toMap}")
  }

  test("simhash banding rejects parameters that break pigeonhole completeness") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 4, numBands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", numBands = 5, bandBits = 16) // 80 > 64 bits
    }
  }

  test("minhash_union sketch estimates dataset-level jaccard") {
    import graft.functions.MinHashUnionAgg._
    import graft.functions.TextFunctions.shingleHashes
    // two overlapping halves of the corpus: estimate J(A,B) from the
    // two dataset signatures and sanity-check against the exact value
    val withH = docs.select($"doc_id", shingleHashes($"text", 5).as("h"))
    val a = withH.filter($"doc_id" % 3 =!= 0)
    val b = withH.filter($"doc_id" % 2 === 0)
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(minhash_union($"h").as("s")).as[Seq[Long]].head()
    val est = estimatedJaccard(sig(a), sig(b))
    val ga = a.select(explode($"h").as("g")).distinct()
    val gb = b.select(explode($"h").as("g")).distinct()
    val inter = ga.intersect(gb).count().toDouble
    val union = ga.union(gb).distinct().count().toDouble
    val exact = inter / union
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
    // associativity: signature of the union == merge of signatures
    val sigUnion = sig(a.union(b).dropDuplicates("doc_id"))
    val merged = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    assert(sigUnion == merged.toSeq)
  }

  test("quality metrics are sane on the documents fixture") {
    val m = graft.PipelineQueries.tQuality(spark, dir)
    val row = m.filter($"doc_id" === 0).head()
    assert(row.getAs[Int]("n_tokens") > 0)
    assert(row.getAs[Double]("avg_token_len") > 1.0)
    assert(m.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
  }
}
