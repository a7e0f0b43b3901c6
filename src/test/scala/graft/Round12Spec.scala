package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JVM-shared batch-size probe for the mapBinaryBatches spec (a
  * closure-captured queue would be serialized per task and the
  * driver's copy would stay empty). */
object Round12BatchProbe {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

/** Round-12 additions: TF-cosine all-pairs similarity, token-budget
  * mixture sampling, per-class quality-percentile filtering, FULL
  * OUTER / correlated-EXISTS query gates, batched multimodal codec
  * pipeline. */
class Round12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  // ---- Dedup.tfCosinePairs -------------------------------------------

  test("tfCosinePairs: exact pairs, threshold boundary, symmetry-free") {
    import spark.implicits._
    // a/b near-identical (one word changed), c unrelated, d == a exactly
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w9"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("id", "text")
    val got = Dedup.tfCosinePairs(docs, "id", "text",
        k = 3, thresholdNum = 3, thresholdDen = 5, maxDf = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 1-2 and 2-4 share 5 of 6 shingles (cos ~ 5/6), 1-4 identical,
    // 3 matches nobody; every pair ordered a < b, no mirror rows
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("tfCosinePairs: tf weighting distinguishes repeated shingles") {
    import spark.implicits._
    // Same shingle SET, different multiplicities: set-Jaccard would
    // call these identical; TF cosine must not return cos2 == 1.
    val docs = Seq(
      (1L, "a b c a b c a b c a b c"),
      (2L, "a b c d e f")).toDF("id", "text")
    val r = Dedup.tfCosinePairs(docs, "id", "text",
        k = 3, thresholdNum = 1, thresholdDen = 100, maxDf = 64)
      .select("cos2").as[Double].collect()
    assert(r.length == 1 && r.head < 1.0 && r.head > 0.0)
  }

  test("tfCosinePairs: terms over maxDf are dropped from the space") {
    import spark.implicits._
    // The only shared shingles appear in ALL four docs -> df 4 > maxDf 3
    // -> similarity over the kept space is zero: no pairs at all.
    val docs = (1L to 4L).map(i => (i, s"c1 c2 c3 u$i v$i w$i"))
      .toDF("id", "text")
    val got = Dedup.tfCosinePairs(docs, "id", "text",
      k = 3, thresholdNum = 1, thresholdDen = 100, maxDf = 3)
    assert(got.isEmpty)
  }

  // ---- Curation.tokenBudgetSample ------------------------------------

  test("tokenBudgetSample: exclusive prefix < budget, crossing doc kept") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 10L), ("s1", 3L, 10L), ("s1", 4L, 10L),
      ("s2", 9L, 100L)).toDF("src", "id", "n")
    // md5 order within s1; budget 25 admits docs while prev < 25:
    // first two always (prev 0, 10), third (prev 20) crosses -> kept,
    // fourth (prev 30) dropped. s2's single huge doc: prev 0 -> kept.
    val got = Curation.tokenBudgetSample(df, "src", "id", col("n"), 25L)
    assert(got.filter(col("src") === "s1").count() == 3)
    assert(got.filter(col("src") === "s2").count() == 1)
    // deterministic: same members on re-run
    val a = got.select("id").as[Long].collect().sorted.toSeq
    val b = Curation.tokenBudgetSample(df, "src", "id", col("n"), 25L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("tokenBudgetSample: one exchange serves sort + running sum") {
    import spark.implicits._
    val df = Seq(("s1", 1L, 5L), ("s1", 2L, 5L)).toDF("src", "id", "n")
    val plan = Curation.tokenBudgetSample(df, "src", "id", col("n"), 7L)
      .queryExecution.executedPlan.toString()
    assert("(?i)exchange".r.findAllIn(plan).size == 1, plan)
  }

  // ---- Curation.qualityPercentileFilter ------------------------------

  test("qualityPercentileFilter: per-class cut at the exact percentile") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("b", 100L, 1.0), ("b", 101L, 2.0))
    val got = Curation.qualityPercentileFilter(
        df.toDF("cls", "id", "score"), "cls", col("score"), q = 0.5)
      .select("id").as[Long].collect().toSet
    // class a: median of 1..10 = 5.5 -> keep 6..10; class b: median of
    // {1,2} = 1.5 -> keep only 2.0
    assert(got == Set(6L, 7L, 8L, 9L, 10L, 101L))
  }

  test("qualityPercentileFilter: threshold relation broadcasts back") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("cls", "id", "score")
    val plan = Curation.qualityPercentileFilter(df, "cls", col("score"), 0.5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---- q35 / q36 plan shapes -----------------------------------------

  test("q36: correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val plan = Queries.q36ExistsSubquery(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  // ---- Multimodal batched codec pipeline -----------------------------

  test("mapBinaryBatches: batch shapes, order, partial last batch") {
    import spark.implicits._
    // the probe lives in a top-level object: the serialized closure
    // re-resolves the module statically, so executor threads (same JVM
    // in local mode) record into the SAME queue the assertion reads
    Round12BatchProbe.seen.clear()
    val codec: Seq[Array[Byte]] => Seq[Array[Float]] = { batch =>
      Round12BatchProbe.seen.add(batch.length)
      graft.functions.FakeCodec.embedBatch(batch)
    }
    val df = (1L to 10L).map(i => (i, Array.fill(8)(i.toByte)))
      .toDF("id", "payload").repartition(1)
    val out = operators.Multimodal
      .mapBinaryBatches(df, "id", "payload", batchSize = 4, codec = codec)
      .collect()
    assert(out.length == 10)
    // 10 rows in one partition at batch 4 -> batches of 4, 4, 2
    assert(Round12BatchProbe.seen.toArray.toSeq
      .map(_.asInstanceOf[Int]).sorted == Seq(2, 4, 4))
    // ids preserved and each feature row matches the per-row codec
    out.foreach { r =>
      val id = r.getLong(0)
      val want = graft.functions.FakeCodec.embed(Array.fill(8)(id.toByte))
      assert(r.getSeq[Float](1) == want.toSeq, s"id $id")
    }
  }

  test("mapBinaryBatches: arity-violating codec fails actionably") {
    import spark.implicits._
    val bad: Seq[Array[Byte]] => Seq[Array[Float]] = b =>
      graft.functions.FakeCodec.embedBatch(b).drop(1)
    val df = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](3))).toDF("id", "b")
    val e = intercept[Exception] {
      operators.Multimodal.mapBinaryBatches(df, "id", "b", 8, bad).collect()
    }
    assert(e.getMessage.contains("one output per input") ||
      Option(e.getCause).exists(_.getMessage.contains("one output per input")))
  }

  test("batched codec path == in-plan expression path (same features)") {
    import spark.implicits._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("b"))
    val batched = operators.Multimodal
      .mapBinaryBatches(df, "id", "b", batchSize = 32)
      .as[(Long, Seq[Float])].collect().toMap
    val inline = operators.Multimodal.withByteHistogram(df, "b")
      .select(col("id"), col("features"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(batched.keySet == inline.keySet)
    batched.foreach { case (id, f) => assert(f == inline(id), s"id $id") }
  }

  test("binaryNearDupPairs: byte-edited payload pairs, unrelated don't") {
    import spark.implicits._
    val base = Array.tabulate(256)(i => (i % 97).toByte)
    val edited = base.clone(); edited(5) = 77.toByte // tiny edit
    val other = Array.tabulate(256)(i => (255 - i % 13).toByte)
    val df = Seq((1L, base), (2L, edited), (3L, other)).toDF("id", "b")
    val got = operators.Multimodal.binaryNearDupPairs(df, "id", "b", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("byte histogram: null/empty payload embeds to the zero vector") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array.empty[Byte])).toDF("id", "b")
    val rows = operators.Multimodal.withByteHistogram(df, "b")
      .select("features").as[Seq[Float]].collect()
    rows.foreach(f => assert(f.length == 16 && f.forall(_ == 0f)))
  }

  test("q35: full outer join emits null-padded rows on both sides") {
    import spark.implicits._
    val r = Queries.q35FullOuter(spark, "/root/testdata/sf0.001")
    assert(r.filter(col("f_total").isNull).count() > 0)
    assert(r.filter(col("o_total").isNull).count() > 0)
    // counts coalesced: never null
    assert(r.filter(col("f_cnt").isNull || col("o_cnt").isNull).count() == 0)
  }
}
