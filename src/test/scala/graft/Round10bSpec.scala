package graft

import graft.core.{GraftTable, TableConfig}
import graft.operators.{Curation, Dedup, IncrementalMv}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions: pre-image CDC, incremental MV maintenance,
  * line-level dedup, sliding-window chunking. */
class Round10bSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "k", orderingField = "v",
    partitionField = Some("g"), tableType = TableConfig.Cow, numBuckets = 2)

  private def fresh(name: String) =
    graft.util.TempDirs.create(s"graft-$name-").toString

  test("readCdc withPreimages: i / ub+ua / d with correct images") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh("cdcpre"), cfg("cdcpre"))
    val c1 = t.insert(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "g", "v"))
    t.upsert(Seq((2L, "a", 25.0), (4L, "b", 40.0)).toDF("k", "g", "v")) // u + i
    t.deleteWhere(col("k") === 3L)                                      // d
    val cdc = t.readCdc(c1, withPreimages = true)
      .select("_change_type", "k", "v").as[(String, Long, Double)]
      .collect().toSet
    assert(cdc == Set(
      ("i", 4L, 40.0),
      ("ub", 2L, 20.0), ("ua", 2L, 25.0),
      ("d", 3L, 30.0)))
    // default shape unchanged: single-row updates, after image
    val flat = t.readCdc(c1).select("_change_type", "k", "v")
      .as[(String, Long, Double)].collect().toSet
    assert(flat == Set(("i", 4L, 40.0), ("u", 2L, 25.0), ("d", 3L, 30.0)))
  }

  test("IncrementalMv maintenance equals full recompute") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh("mvbase"), cfg("mvbase"))
    val mv = GraftTable.create(spark, fresh("mv"), TableConfig(
      name = "mv", keyField = "g", orderingField = "_refreshed",
      partitionField = None, tableType = TableConfig.Cow, numBuckets = 1))
    val c1 = t.insert(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "g", "v"))
    mv.insert(IncrementalMv.fullAggregate(t.read(), "g", "v")
      .withColumn("_refreshed", lit(0L)))
    // wave: update k=2 (a: 20→25), insert k=4 (b), delete k=1 (a)
    t.upsert(Seq((2L, "a", 25.0), (4L, "b", 40.0)).toDF("k", "g", "v"))
    t.deleteWhere(col("k") === 1L)
    IncrementalMv.refresh(spark, mv, t.readCdc(c1, withPreimages = true), "g", "v")
    val got = mv.read().select("g", "cnt", "sum_value")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map { case (g, c, s) => (g, c, s.doubleValue) }.toSet
    val full = IncrementalMv.fullAggregate(t.read(), "g", "v")
      .select(col("g"), col("cnt"), col("sum_value").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == full)
    assert(got == Set(("a", 1L, 25.0), ("b", 2L, 70.0)))
  }

  test("IncrementalMv retracting a whole group deletes its MV row") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh("mvdel"), cfg("mvdel"))
    val mv = GraftTable.create(spark, fresh("mvd"), TableConfig(
      name = "mvd", keyField = "g", orderingField = "_refreshed",
      partitionField = None, tableType = TableConfig.Cow, numBuckets = 1))
    val c1 = t.insert(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "g", "v"))
    mv.insert(IncrementalMv.fullAggregate(t.read(), "g", "v")
      .withColumn("_refreshed", lit(0L)))
    t.deleteWhere(col("g") === "a")
    IncrementalMv.refresh(spark, mv, t.readCdc(c1, withPreimages = true), "g", "v")
    val groups = mv.read().select("g").collect().map(_.getString(0)).toSet
    assert(groups == Set("b"))
  }

  test("IncrementalMv.sync: cursor-managed refresh, one commit each, idempotent") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh("mvsb"), cfg("mvsb"))
    val mv = GraftTable.create(spark, fresh("mvs"), TableConfig(
      name = "mvs", keyField = "g", orderingField = "_refreshed",
      partitionField = None, tableType = TableConfig.Cow, numBuckets = 1))
    def state(): Set[(String, Long, Double)] =
      mv.read().select(col("g"), col("cnt"), col("sum_value").cast("double"))
        .as[(String, Long, Double)].collect().toSet
    def full(): Set[(String, Long, Double)] =
      graft.operators.IncrementalMv.fullAggregate(t.read(), "g", "v")
        .select(col("g"), col("cnt"), col("sum_value").cast("double"))
        .as[(String, Long, Double)].collect().toSet

    t.insert(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v"))
    graft.operators.IncrementalMv.sync(spark, t, mv, "g", "v") // full build
    assert(state() == full())
    val commitsAfterBuild = mv.log.commits().size

    // wave 2: update + insert + whole-group delete, ONE sync commit
    t.upsert(Seq((1L, "a", 15.0), (3L, "c", 30.0)).toDF("k", "g", "v"))
    t.deleteWhere(col("g") === "b")
    graft.operators.IncrementalMv.sync(spark, t, mv, "g", "v")
    assert(state() == full())
    assert(state() == Set(("a", 1L, 15.0), ("c", 1L, 30.0)))
    assert(mv.log.commits().size == commitsAfterBuild + 1,
      "a refresh (incl. the zero-group retraction) must be ONE commit")

    // caught up: no-op, no commit, cursor intact
    assert(graft.operators.IncrementalMv.sync(spark, t, mv, "g", "v") == 0L)
    assert(mv.log.commits().size == commitsAfterBuild + 1)
    // the cursor rode inside the refresh commit (atomic with the data)
    assert(graft.operators.IncrementalMv.lastCursor(mv).nonEmpty)

    // a retracted group can come back
    t.insert(Seq((9L, "b", 5.0)).toDF("k", "g", "v"))
    graft.operators.IncrementalMv.sync(spark, t, mv, "g", "v")
    assert(state() == full())
    assert(state().exists(_._1 == "b"))
  }

  test("lineDedup removes cross-document boilerplate, keeps order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal content one\nFOOTER"),
      (2L, "COOKIE BANNER\nunique text two\nFOOTER"),
      (3L, "COOKIE BANNER\nanother body\nFOOTER"),
      (4L, "all original here\nno boilerplate")).toDF("doc_id", "text")
    // lines in >= 3 of 4 docs are boilerplate
    val out = Dedup.lineDedup(docs, "doc_id", "text", "\n", minDocs = 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "real content one", 1L),
      (2L, "unique text two", 1L),
      (3L, "another body", 1L),
      (4L, "all original here\nno boilerplate", 2L)))
  }

  test("lineDedup drops documents that are pure boilerplate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x\ny"), (2L, "x\ny"), (3L, "x\ny"), (4L, "x\nkeep me")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", "\n", minDocs = 3)
      .as[(Long, String, Long)].collect().toSeq
    // x appears in 4 docs, y in 3 → docs 1-3 vanish entirely
    assert(out == Seq((4L, "keep me", 1L)))
  }

  test("lineDedup counts a line once per doc (intra-doc repeats)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup\ndup\ndup\nbody"), (2L, "other\nthing")).toDF("doc_id", "text")
    // "dup" repeats inside doc 1 but exists in only 1 doc → DF = 1 < 2
    val out = Dedup.lineDedup(docs, "doc_id", "text", "\n", minDocs = 2)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "dup\ndup\ndup\nbody", 4L), (2L, "other\nthing", 2L)))
  }

  test("chunkDocuments windows, stride, and edges") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val docs = Seq((1L, doc), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text",
        windowTokens = 4, strideTokens = 3)
      .orderBy("id", "chunk_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 4, "w1 w2 w3 w4"),
      (1L, 1, 4, "w4 w5 w6 w7"),
      (1L, 2, 4, "w7 w8 w9 w10"),
      (1L, 3, 1, "w10"),
      (2L, 0, 3, "a b c"),
      (3L, 0, 1, "solo")))
  }

  test("Transformers.sql binds <SRC>, leaves no temp view behind") {
    import spark.implicits._
    val in = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val before = spark.catalog.listTables().count()
    val out = graft.ingest.Transformers.sql(
      "SELECT k, v * 10 AS v FROM <SRC> WHERE k > 1")(in)
    assert(out.as[(Long, Double)].collect().toSeq == Seq((2L, 30.0)))
    assert(spark.catalog.listTables().count() == before, "temp view leaked")
  }

  test("Transformers.flatten unnests structs recursively, in order") {
    import spark.implicits._
    val in = Seq((1L, ("x", (2.5, true)), "tail"))
      .toDF("id", "nest", "plain")
      .selectExpr("id",
        "named_struct('a', nest._1, 'deep', named_struct('b', nest._2._1, 'c', nest._2._2)) AS nest",
        "plain")
    val out = graft.ingest.Transformers.flatten(in)
    assert(out.columns.toSeq == Seq("id", "nest_a", "nest_deep_b", "nest_deep_c", "plain"))
    assert(out.as[(Long, String, Double, Boolean, String)].collect().toSeq ==
      Seq((1L, "x", 2.5, true, "tail")))
  }

  test("Transformers.chain composes left to right") {
    import spark.implicits._
    val in = Seq((1L, 2.0)).toDF("k", "v")
    val t = graft.ingest.Transformers.chain(
      graft.ingest.Transformers.sql("SELECT k, v + 1 AS v FROM <SRC>"),
      graft.ingest.Transformers.sql("SELECT k, v * 2 AS v FROM <SRC>"))
    assert(t(in).as[(Long, Double)].collect().toSeq == Seq((1L, 6.0))) // (2+1)*2
  }

  test("chunkDocuments is map-only (no shuffle in the plan)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Curation.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
