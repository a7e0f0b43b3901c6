package graft

import graft.operators.{Curation, Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: calendar densification + recursive CTE SQL,
  * running distinct windows, MERGE's NOT MATCHED BY SOURCE clause,
  * shingle-containment dedup, int8 quantization, hashed n-gram
  * classifier. */
class Round13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  // ---- q38 twin: recursive SQL (Spark 4 UnionLoop) -------------------

  test("WITH RECURSIVE runs through spark.sql and matches sequence()") {
    // The q38 gate generates the calendar with sequence()+explode (the
    // 100 TB plan — no iteration); this proves the recursive-CTE SQL
    // surface itself works in the engine and agrees with it.
    val rec = spark.sql(
      """WITH RECURSIVE r(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM r WHERE n < 50)
        |SELECT n FROM r ORDER BY n""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    assert(rec == (1 to 50))
  }

  test("q38 calendar fill has no gaps and a monotone running total") {
    val rows = Queries.q38CalendarFill(spark, "/root/testdata/sf0.001")
      .collect()
    val days = rows.map(_.getString(0))
    assert(days.length > 1)
    // consecutive ISO days, every calendar day present exactly once
    val first = java.time.LocalDate.parse(days.head)
    days.zipWithIndex.foreach { case (d, i) =>
      assert(java.time.LocalDate.parse(d) == first.plusDays(i.toLong)) }
    // cum is the prefix sum of n
    val ns = rows.map(_.getLong(1))
    val cums = rows.map(_.getLong(2))
    assert(cums.toSeq == ns.scanLeft(0L)(_ + _).drop(1).toSeq)
    assert(ns.exists(_ == 0L), "span must contain at least one empty day")
  }

  // ---- q39: running distinct --------------------------------------

  test("q39 running distinct is per-user monotone, capped by the domain") {
    val df = Queries.q39WindowedDistinct(spark, "/root/testdata/sf0.001")
    val types = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_type").distinct().count()
    val bad = df
      .withColumn("prev", lag(col("n_types"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts_us").asc, col("event_id").asc)))
      .filter(col("prev").isNotNull && (col("n_types") < col("prev") ||
        col("n_types") > lit(types)))
    assert(bad.isEmpty)
  }

  // ---- MERGE: WHEN NOT MATCHED BY SOURCE -----------------------------

  private def mergeFixture(name: String): (graft.sql.GraftSql, core.GraftTable) = {
    import spark.implicits._
    val wh = graft.util.TempDirs.create(s"graft-$name-").toString
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    val t = catalog.createTable(core.TableConfig(
      name = name, keyField = "id", orderingField = "ts",
      partitionField = None, tableType = core.TableConfig.Cow,
      numBuckets = 2))
    t.insert(Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
      .toDF("id", "name", "ts"))
    (gsql, t)
  }

  test("MERGE full-sync: update matched, delete keys absent from source") {
    import spark.implicits._
    val (gsql, t) = mergeFixture("m13a")
    gsql.sql(
      """MERGE INTO m13a USING (
        |  SELECT 1 AS id, 'a2' AS name, 20 AS ts
        |  UNION ALL SELECT 2, 'b2', 20) AS s
        |ON s.id = m13a.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = t.read().select("id", "name").as[(Long, String)]
      .collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b2"))) // 3 deleted, 1/2 updated
  }

  test("MERGE BY SOURCE alone deletes only the complement keys") {
    import spark.implicits._
    val (gsql, t) = mergeFixture("m13b")
    gsql.sql(
      """MERGE INTO m13b USING (SELECT 2 AS id, 'zz' AS name, 5 AS ts) AS s
        |ON s.id = m13b.id
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = t.read().select("id", "name").as[(Long, String)]
      .collect().toSet
    assert(got == Set((2L, "b"))) // untouched: BY SOURCE never updates
  }

  test("MERGE BY SOURCE composes with INSERT * (sync including adds)") {
    import spark.implicits._
    val (gsql, t) = mergeFixture("m13c")
    gsql.sql(
      """MERGE INTO m13c USING (
        |  SELECT 3 AS id, 'c9' AS name, 5 AS ts
        |  UNION ALL SELECT 9, 'new', 5) AS s
        |ON s.id = m13c.id
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = t.read().select("id", "name").as[(Long, String)]
      .collect().toSet
    // 9 inserted; 1/2 deleted (absent from source); 3 kept UNTOUCHED
    // (matched, and there is no WHEN MATCHED clause — ts=5 < 10 would
    // lose the merge anyway, but the row must simply not be written)
    assert(got == Set((3L, "c"), (9L, "new")))
  }

  // ---- Dedup.containmentPairs ----------------------------------------

  test("containment catches an excerpt that Jaccard dilutes") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (5 to 12).map(i => s"w$i").mkString(" ") // 8 of 40 words
    val docs = Seq((1L, big), (2L, excerpt), (3L, "q r s t u v"))
      .toDF("id", "text")
    val cont = Dedup.containmentPairs(docs, "id", "text",
      k = 3, thresholdNum = 9, thresholdDen = 10, maxDf = 64)
    val rows = cont.select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect()
    // every 3-shingle of the excerpt appears in the big doc -> C = 1.0
    assert(rows.toSeq == Seq((1L, 2L, 1.0)))
    // while the symmetric Jaccard of the same pair is far below 0.5
    val j = Dedup.ngramJaccardPairs(docs, "id", "text", k = 3,
        threshold = 0.0)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L)
      .select("jaccard").as[Double].collect()
    assert(j.length == 1 && j.head < 0.2)
  }

  test("containment threshold is an exact integer-domain decision") {
    import spark.implicits._
    // excerpt yields 4 shingles, 3 shared with big -> C = 3/4 exactly:
    // kept at num/den = 3/4, dropped at 4/5
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 x7"),
      (2L, "w1 w2 w3 w4 w5 z6")).toDF("id", "text")
    def pairs(num: Int, den: Int) =
      Dedup.containmentPairs(docs, "id", "text", k = 3,
        thresholdNum = num, thresholdDen = den, maxDf = 64).count()
    assert(pairs(3, 4) == 1L && pairs(4, 5) == 0L)
  }

  // ---- Similarity.quantizeInt8 ---------------------------------------

  test("int8 quantization: bounds, zero guard, error within half a step") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero vector
      (3L, Array(1e-8f, -1e-8f, 1e-8f, 1e-8f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(embs, "embedding")
      .select("vec_id", "qvec", "scale", "max_err")
      .as[(Long, Seq[Int], Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(q(1L)._2 == Seq(64, -127, 32, 0))
    assert(q(2L)._2 == Seq(0, 0, 0, 0) && q(2L)._3 == 0.0 && q(2L)._4 == 0.0)
    // max element always hits ±127; every component within int8 range
    q.values.foreach(r => assert(r._2.forall(v => v >= -127 && v <= 127)))
    // reconstruction error ≤ half a quantization step (0.5 / scale)
    q.values.filter(_._3 > 0).foreach(r =>
      assert(r._4 <= 0.5 / r._3 + 1e-12))
  }

  test("int8 quantization is map-only (zero exchanges)") {
    val plan = Similarity.quantizeInt8(
      Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
      "embedding").queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.isEmpty)
  }

  // ---- Curation.hashedNgramClassifier --------------------------------

  test("hashed classifier: deterministic, exact term count, keep==sign") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha"),
      (3L, "alpha beta gamma")).toDF("id", "text")
    val r = Curation.hashedNgramClassifier(docs, "id", "text", dim = 4096)
      .as[(Long, Long, Double, Boolean)].collect().map(x => x._1 -> x).toMap
    // 3 unigrams + 2 bigrams; the 1-token doc contributes its token
    // twice (unigram + degenerate bigram), mirroring the oracle
    assert(r(1L)._2 == 5L && r(2L)._2 == 2L)
    assert(r(1L) == r(3L).copy(_1 = 1L)) // identical text -> identical score
    r.values.foreach(x => assert(x._4 == (x._3 >= 0.0)))
  }

  test("round-13 operators degrade cleanly on empty input") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.containmentPairs(noDocs, "id", "text").count() == 0L)
    assert(Curation.hashedNgramClassifier(noDocs, "id", "text").count() == 0L)
    assert(Curation.decontaminate(noDocs, noDocs, "id", "text").count() == 0L)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.quantizeInt8(noVecs, "embedding").count() == 0L)
    // decontaminating against an empty eval set keeps everything
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    assert(Curation.decontaminate(docs, noDocs, "id", "text").count() == 1L)
  }

  test("assignSplits validates fractions and stays growth-stable") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, "id", Seq("a" -> 0.5)) }
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, "id", Seq("a" -> 0.5, "b" -> 0.6)) }
    val full = Curation.assignSplits(docs, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    // growth stability: assignments over a SUBSET agree row-for-row
    val sub = Curation.assignSplits(docs.filter($"id" <= 100), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
    assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    // all three splits materialize at n=200 under uniform md5
    assert(full.values.toSet.size == 3)
  }

  test("hashed classifier scores are bounded by the weight range") {
    import spark.implicits._
    val docs = Seq((1L, "some words to score here")).toDF("id", "text")
    val s = Curation.hashedNgramClassifier(docs, "id", "text", dim = 64)
      .select("score").as[Double].head()
    // |mean weight| ≤ 998/1997 < 0.5
    assert(math.abs(s) < 0.5)
  }
}
