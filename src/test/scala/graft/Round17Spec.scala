package graft

import graft.core.{GraftTable, TableConfig, TableServices}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 hardening: dropColumn×index interaction, schema-faithful
  * snapshot export readback. */
class Round17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def freshRoot(name: String): String =
    graft.util.TempDirs.create(s"graft-$name-").toString

  test("dropColumn refuses while a secondary index references the column") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshRoot("dropidx"),
      TableConfig(name = "dropidx", keyField = "k", orderingField = "ts",
        tableType = TableConfig.Cow, numBuckets = 2,
        indexes = Map("v_bloom" -> "bloom:v")))
    t.insert(Seq((1L, 1L, "a")).toDF("k", "ts", "v"))
    val e = intercept[IllegalArgumentException](t.dropColumn("v"))
    assert(e.getMessage.contains("v_bloom"))
    assert(e.getMessage.contains("DROP INDEX"))
    // un-indexed columns still droppable on the same table
    t.upsert(Seq((1L, 2L, "a", "x")).toDF("k", "ts", "v", "w"))
    t.dropColumn("w")
  }

  test("_commit_seqno: unique per row, commit-prefixed, monotone across commits") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshRoot("seqno"),
      TableConfig(name = "seqno", keyField = "k", orderingField = "ts",
        tableType = TableConfig.Cow, numBuckets = 2))
    val c1 = t.insert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ts", "v"))
    val c2 = t.upsert(Seq((1L, 2L, "a2"), (3L, 2L, "c")).toDF("k", "ts", "v"))
    val rows = t.read()
      .select("k", TableConfig.CommitSeqNoCol, TableConfig.CommitTimeCol)
      .as[(Long, String, String)].collect()
    // unique per row
    assert(rows.map(_._2).distinct.length == rows.length)
    // seqno prefix = the row's writing commit instant
    rows.foreach { case (_, seq, ct) => assert(seq.startsWith(ct + "_")) }
    // monotone across commits: every commit-2 seqno sorts after every
    // commit-1 seqno (instants are lexically ordered)
    val (of1, of2) = rows.partition(_._3 == c1)
    assert(of1.nonEmpty && of2.nonEmpty)
    assert(of1.map(_._2).max < of2.map(_._2).min)
    // unchanged row (k=2) keeps its ORIGINAL commit-1 seqno through
    // the COW rewrite, like _commit_time
    assert(rows.find(_._1 == 2L).get._3 == c1)
    val _ = c2
  }

  test("hive-sync skip_ro_suffix: bare MOR name serves the read-optimized view") {
    import spark.implicits._
    val wh = freshRoot("skipro_wh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val t = catalog.createTable(TableConfig(
      name = "skipro", keyField = "k", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 2))
    t.insert(Seq((1L, 1L, "a")).toDF("k", "ts", "v"))
    t.upsert(Seq((1L, 2L, "a2")).toDF("k", "ts", "v")) // delta only
    // default naming: bare = realtime merge, _ro stale, _rt realtime
    catalog.syncViews()
    assert(spark.sql("SELECT v FROM skipro").as[String].head() == "a2")
    assert(spark.sql("SELECT v FROM skipro_ro").as[String].head() == "a")
    // skip_ro_suffix: bare name now serves the read-optimized view
    spark.conf.set("graft.skipro.hive_sync.skip_ro_suffix", "true")
    try {
      catalog.syncViews()
      assert(spark.sql("SELECT v FROM skipro").as[String].head() == "a")
      assert(spark.sql("SELECT v FROM skipro_rt").as[String].head() == "a2")
    } finally spark.conf.unset("graft.skipro.hive_sync.skip_ro_suffix")
  }

  test("sharedSpanPairs: planted verbatim passage found, boundary exact") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val span20 = words("s", 20)  // exactly 20 shared tokens
    val span19 = words("t", 19)  // one under the threshold
    val docs = Seq(
      (1L, s"${words("a", 30)} $span20 ${words("b", 25)}"),
      (2L, s"${words("c", 10)} $span20 ${words("d", 40)}"),
      (3L, s"${words("e", 30)} $span19 ${words("f", 25)}"),
      (4L, s"${words("g", 12)} $span19 ${words("h", 40)}"),
      (5L, words("z", 60)) // shares nothing
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .sharedSpanPairs(docs, "doc_id", "text", k = 8, minTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // only the 20-token passage qualifies, and its length is EXACT:
    // 13 shared 8-grams on one diagonal → 13 + 7 = 20 tokens
    assert(got == Seq((1L, 2L, 20L)))
  }

  test("sharedSpanPairs: df-cap drops ubiquitous grams (under-detect, never wrong)") {
    import spark.implicits._
    val common = (1 to 30).map(i => s"w$i").mkString(" ")
    // the same 30-token passage in 5 docs; maxDf=4 drops its grams
    val docs = (1L to 5L).map(i => (i, s"intro$i $common tail$i"))
      .toDF("doc_id", "text")
    assert(graft.operators.Dedup
      .sharedSpanPairs(docs, "doc_id", "text", k = 8, minTokens = 20,
        maxDf = 4).count() == 0)
    // with the cap above the df, all 10 pairs surface at full length
    val full = graft.operators.Dedup
      .sharedSpanPairs(docs, "doc_id", "text", k = 8, minTokens = 20,
        maxDf = 10)
    assert(full.count() == 10)
    assert(full.select("span_tokens").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(30L))
  }

  test("exportSnapshot sidecar keeps numeric-looking string partitions typed") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshRoot("exptype"),
      TableConfig(name = "exptype", keyField = "k", orderingField = "ts",
        partitionField = Some("p"), tableType = TableConfig.Cow,
        numBuckets = 2))
    // partition values that LOOK like integers — bare inference would
    // return p as int and break schema fidelity
    t.insert(Seq((1L, 1L, "123", 1.5), (2L, 1L, "0456", 2.5))
      .toDF("k", "ts", "p", "v"))
    val dest = freshRoot("exptype_out")
    TableServices.exportSnapshot(t, dest)
    val inferred = spark.read.parquet(dest)
    val faithful = TableServices.readExportedSnapshot(spark, dest)
    assert(faithful.schema("p").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(faithful.select("p").as[String].collect().sorted
      .sameElements(Array("0456", "123")))
    // demonstrate the hazard the sidecar exists to prevent: inference
    // loses the leading zero / the string type
    assert(inferred.schema("p").dataType !=
      org.apache.spark.sql.types.StringType)
  }
}
