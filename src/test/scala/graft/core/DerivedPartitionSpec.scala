package graft.core

import graft.Session
import graft.sql.GraftRuntimeFilteringScan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Derived partition paths — the TimestampBasedKeyGenerator analog
  * (reference hudi-spark-minio-trino/demo/config/test-suite/
  * test.properties:34-42: `timestamp.type=UNIX_TIMESTAMP`,
  * `output.dateformat=yyyy/MM/dd`): partition value = date_format of
  * an epoch column, nested hive-style dirs, record identity on the
  * DERIVED value, scan pruning via source-column stats. */
class DerivedPartitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def freshRoot(name: String): String =
    graft.util.TempDirs.create(s"graft-$name-").toString

  // epoch SECONDS for three UTC days
  private val D1 = 1692000000L // 2023/08/14
  private val D2 = 1692100000L // 2023/08/15
  private val D3 = 1692300000L // 2023/08/17

  private def cfg(name: String, tpe: String = TableConfig.Cow) = TableConfig(
    name = name, keyField = "k", orderingField = "ts",
    partitionField = Some("ts"), partitionFormat = Some("yyyy/MM/dd"),
    partitionUnit = "s", tableType = tpe, numBuckets = 2)

  private def rows(t: (Long, Long, String)*): DataFrame =
    t.toDF("k", "ts", "v")

  test("write derives nested yyyy/MM/dd dirs; partitions list derived values") {
    val root = freshRoot("deriv_layout")
    val t = GraftTable.create(spark, root, cfg("deriv_layout"))
    t.insert(rows((1L, D1, "a"), (2L, D2, "b")))
    assert(Files.isDirectory(Paths.get(root, "data", "2023", "08", "14")))
    assert(Files.isDirectory(Paths.get(root, "data", "2023", "08", "15")))
    assert(t.partitions().sorted == Seq("2023/08/14", "2023/08/15"))
  }

  test("identity is (derived day, key): same day merges, other days don't") {
    val t = GraftTable.create(spark, freshRoot("deriv_id"), cfg("deriv_id"))
    t.insert(rows((1L, D1, "a"), (1L, D2, "b")))
    // same key, same day, later second → replaces the day's version;
    // same key, new day → third record
    t.upsert(rows((1L, D1 + 5, "a2"), (1L, D3, "c")))
    val got = t.read().select("ts", "v").as[(Long, String)].collect().toMap
    assert(got == Map(D1 + 5 -> "a2", D2 -> "b", D3 -> "c"))
  }

  test("MOR realtime merge honors derived identity") {
    val t = GraftTable.create(spark, freshRoot("deriv_mor"),
      cfg("deriv_mor", TableConfig.Mor))
    t.insert(rows((1L, D1, "a"), (1L, D2, "b")))
    t.upsert(rows((1L, D1 + 5, "a2"))) // delta: must shadow ONLY day 1
    val got = t.readRealtime().select("ts", "v").as[(Long, String)]
      .collect().toMap
    assert(got == Map(D1 + 5 -> "a2", D2 -> "b"))
    // compaction folds the delta without collapsing the two days
    TableServices.compact(t)
    val ro = t.readOptimized().select("v").as[String].collect().sorted
    assert(ro.toSeq == Seq("a2", "b"))
  }

  test("delete removes every stored version of the day's record") {
    val t = GraftTable.create(spark, freshRoot("deriv_del"), cfg("deriv_del"))
    t.insert(rows((1L, D1, "a"), (2L, D1, "x")))
    t.upsert(rows((1L, D1 + 5, "a2"))) // same record, newer version
    t.deleteWhere(col("k") === 1L)
    // the shadowed (1, D1) version must NOT resurrect
    assert(t.read().select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("deletePartitions takes derived values; insertOverwrite replaces a day") {
    val t = GraftTable.create(spark, freshRoot("deriv_parts"), cfg("deriv_parts"))
    t.insert(rows((1L, D1, "a"), (2L, D2, "b"), (3L, D3, "c")))
    t.deletePartitions(Seq("2023/08/17"))
    assert(t.read().count() == 2)
    t.insertOverwrite(rows((9L, D1 + 9, "z"))) // replaces day 1 only
    val got = t.read().select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(9L -> "z", 2L -> "b"))
  }

  test("ts-range scan through the catalog prunes to the day's files") {
    spark.conf.set("spark.sql.catalog.gder", "graft.sql.GraftTableCatalog")
    val wh = freshRoot("deriv_wh")
    spark.conf.set("spark.sql.catalog.gder.warehouse", wh)
    val t = GraftTable.create(spark, s"$wh/devents",
      cfg("devents").copy(name = "devents", numBuckets = 1))
    // one commit per day → one file per day
    t.insert(rows((1L, D1, "a")))
    t.insert(rows((2L, D2, "b")))
    t.insert(rows((3L, D3, "c")))
    assert(t.log.liveFiles().size == 3)
    def scannedFiles(sql: String): Int = {
      val df = spark.sql(sql)
      val n = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[GraftRuntimeFilteringScan].plannedFiles
      }.sum
      df.collect()
      n
    }
    // the day-range predicate on the SOURCE column prunes via its
    // commit-log stats — the derived-partition pruning path (bounds
    // inclusive: the pruner treats < as <= conservatively)
    assert(scannedFiles(
      s"SELECT k FROM gder.devents WHERE ts >= $D2 AND ts <= ${D2 + 10}") == 1)
    assert(scannedFiles(s"SELECT k FROM gder.devents WHERE ts >= $D3") == 1)
    // and an equality literal on ts must NOT mis-prune via partition
    // string comparison (scanPartitionField guards this)
    assert(spark.sql(s"SELECT v FROM gder.devents WHERE ts = $D2")
      .as[String].collect().toSeq == Seq("b"))
  }

  test("SQL DDL round-trip: partitionFormat survives SHOW CREATE TABLE") {
    val wh = freshRoot("deriv_sqlwh")
    val catalog = new graft.sql.GraftCatalog(spark, wh)
    val gsql = new graft.sql.GraftSql(catalog)
    gsql.sql(
      """CREATE TABLE dtick (k BIGINT, ts BIGINT, v STRING) USING GRAFT
        |OPTIONS (primaryKey='k', precombine='ts', partition='ts',
        |         partitionFormat='yyyy/MM/dd', partitionUnit='s')""".stripMargin)
    val show = gsql.sql("SHOW CREATE TABLE dtick")
      .collect().head.getString(0)
    assert(show.contains("partitionFormat='yyyy/MM/dd'"))
    assert(show.contains("partitionUnit='s'"))
    gsql.sql(s"INSERT INTO dtick VALUES (1, $D1, 'a'), (1, ${D1 + 3}, 'b')")
    assert(gsql.sql("SELECT v FROM dtick").collect().map(_.getString(0)).toSeq
      == Seq("b")) // derived-identity merge through SQL
    // config survives a cold load
    val re = GraftTable.load(spark, s"$wh/dtick")
    assert(re.config.partitionFormat.contains("yyyy/MM/dd"))
    assert(re.config.partitionUnit == "s")
  }

  test("duplicate-key invariant groups by derived value, not raw ts") {
    val t = GraftTable.create(spark, freshRoot("deriv_dup"), cfg("deriv_dup"))
    // two INSERT commits with the same (day, key) → a real duplicate
    // that raw-ts grouping would miss (different ts values)
    t.insert(rows((1L, D1, "a")))
    t.insert(rows((1L, D1 + 5, "b")))
    assert(Validation.duplicateKeys(t).count() == 1)
  }

  test("CDC on a derived table emits _partition_path") {
    val t = GraftTable.create(spark, freshRoot("deriv_cdc"), cfg("deriv_cdc"))
    val c1 = t.insert(rows((1L, D1, "a")))
    t.upsert(rows((1L, D1 + 5, "a2"), (2L, D2, "b")))
    val cdc = t.readCdc(fromExclusive = c1)
    assert(cdc.columns.contains("_partition_path"))
    val byType = cdc.select("_change_type", "_partition_path")
      .as[(String, String)].collect().toMap
    assert(byType("u") == "2023/08/14")
    assert(byType("i") == "2023/08/15")
  }

  test("epoch-nanos unit derives without double-precision loss") {
    val t = GraftTable.create(spark, freshRoot("deriv_ns"),
      cfg("deriv_ns").copy(name = "deriv_ns", partitionUnit = "ns"))
    // ns epoch > 2^53: double math would round; DIV must not
    t.insert(rows((1L, D1 * 1000000000L + 123456789L, "a")))
    assert(t.partitions() == Seq("2023/08/14"))
  }

  test("Streamer ingestion lands in derived partitions (test.properties scenario)") {
    import org.apache.spark.sql.types._
    // the reference's test-suite shape: DFS JSON source + streamer into
    // a table whose key generator derives yyyy/MM/dd from an epoch ts
    val srcDir = freshRoot("deriv_src")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", LongType),
      StructField("v", StringType)))
    Files.writeString(Paths.get(srcDir, "b1.json"),
      s"""{"k":1,"ts":$D1,"v":"a"}\n{"k":2,"ts":$D2,"v":"b"}\n""")
    val root = freshRoot("deriv_stream")
    val t = GraftTable.create(spark, root, cfg("deriv_stream"))
    val src = new graft.ingest.JsonDirSource(spark, srcDir, schema,
      s"${freshRoot("deriv_ckpt")}/ckpt")
    graft.ingest.Streamer.runUntilCaughtUp(t, src)
    // second wave: same-day update + a new day
    Files.writeString(Paths.get(srcDir, "b2.json"),
      s"""{"k":1,"ts":${D1 + 5},"v":"a2"}\n{"k":3,"ts":$D3,"v":"c"}\n""")
    graft.ingest.Streamer.runUntilCaughtUp(t, src)
    assert(t.partitions().sorted ==
      Seq("2023/08/14", "2023/08/15", "2023/08/17"))
    assert(Files.isDirectory(Paths.get(root, "data", "2023", "08", "17")))
    val got = t.read().select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("config guards: format without field, bad unit") {
    intercept[IllegalArgumentException](TableConfig(
      name = "bad1", keyField = "k", orderingField = "ts",
      partitionFormat = Some("yyyy")))
    intercept[IllegalArgumentException](TableConfig(
      name = "bad2", keyField = "k", orderingField = "ts",
      partitionField = Some("ts"), partitionFormat = Some("yyyy"),
      partitionUnit = "weeks"))
  }
}
