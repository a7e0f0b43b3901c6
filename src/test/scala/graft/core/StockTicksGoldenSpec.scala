package graft.core

import graft.Session
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The reference demo's golden transcript, end to end, on the actual
  * demo data (FIXTURES.md §1; hudi-spark-minio-trino/README.md
  * 380-419, 744-776, 966-984, 1196-1216): batch_1/batch_2 stock
  * ticks through COW + MOR tables, all ten golden assertions.
  * Skipped silently if the reference data isn't mounted.
  */
class StockTicksGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val dataDir = "/root/reference/hudi-spark-minio-trino/demo/data"
  private def available = Files.exists(Paths.get(s"$dataDir/batch_1.json"))

  private def tmp(): String = graft.util.TempDirs.create("graft-golden-").toString

  private def cfg(name: String, tpe: String) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = Some("date"), tableType = tpe, numBuckets = 4)

  private def batch(n: Int): DataFrame =
    spark.read.json(s"$dataDir/batch_$n.json")

  private def googMax(df: DataFrame): String =
    df.groupBy("symbol").agg(max("ts").as("m"))
      .filter($"symbol" === "GOOG").select("m").as[String].head()

  test("golden 1-5: COW batch1 -> 10:29, batch2 -> 10:59; projection rows; incremental") {
    assume(available)
    val t = GraftTable.create(spark, tmp(), cfg("stock_ticks_cow", TableConfig.Cow))
    val c1 = t.insert(batch(1))
    // golden 1: max(ts) after batch 1 (README.md:380-381)
    assert(googMax(t.read()) == "2018-08-31 10:29:00")
    // golden 2: projection for GOOG -> 2 rows, exact values (README.md:386-389)
    val proj = t.read().filter($"symbol" === "GOOG")
      .select("_commit_time", "symbol", "ts", "volume", "open", "close")
      .orderBy("ts")
      .collect()
    assert(proj.length == 2)
    assert(proj(0).getAs[String]("ts") == "2018-08-31 09:59:00")
    assert(proj(0).getAs[Long]("volume") == 6330L)
    assert(proj(0).getAs[Double]("open") == 1230.5)
    assert(proj(0).getAs[Double]("close") == 1230.02)
    assert(proj(1).getAs[String]("ts") == "2018-08-31 10:29:00")
    assert(proj(1).getAs[Long]("volume") == 3391L)
    // golden 3: after batch 2 (README.md:744-750)
    t.upsert(batch(2))
    assert(googMax(t.read()) == "2018-08-31 10:59:00")
    val updated = t.read().filter($"symbol" === "GOOG" && $"ts" === "2018-08-31 10:59:00")
      .select("volume", "open", "close").as[(Long, Double, Double)].head()
    assert(updated == ((9021L, 1227.1993, 1227.215)))
    // golden 4: incremental from commit 1 = only updated GOOG row for GOOG
    val inc = t.readIncremental(fromExclusive = c1)
    assert(googMax(inc) == "2018-08-31 10:59:00")
    assert(inc.filter($"symbol" === "GOOG").count() == 1)
    // golden 6: partitions
    assert(t.partitions() == Seq("2018/08/31"))
  }

  test("golden 3/5: MOR RO/RT divergence and compaction convergence") {
    assume(available)
    val t = GraftTable.create(spark, tmp(), cfg("stock_ticks_mor", TableConfig.Mor))
    t.insert(batch(1))
    t.upsert(batch(2))
    // README.md:761-776: _ro stale at 10:29, _rt merged at 10:59
    assert(googMax(t.readOptimized()) == "2018-08-31 10:29:00")
    assert(googMax(t.readRealtime()) == "2018-08-31 10:59:00")
    // README.md:1196-1216: after compaction RO == RT
    TableServices.compact(t)
    assert(googMax(t.readOptimized()) == "2018-08-31 10:59:00")
    val ro = t.readOptimized().select("key", "ts").as[(String, String)].collect().toSet
    val rt = t.readRealtime().select("key", "ts").as[(String, String)].collect().toSet
    assert(ro == rt)
    // key uniqueness invariant (A3)
    assert(t.readRealtime().groupBy("key").count().filter($"count" > 1).count() == 0)
  }

  test("full row counts match the demo data (3482 + 1668 inputs -> 197 keys)") {
    assume(available)
    val t = GraftTable.create(spark, tmp(), cfg("stock_ticks_all", TableConfig.Cow))
    t.insert(batch(1))
    t.upsert(batch(2))
    // one row per (symbol, hour) key — the merged table is the key set
    val expectedKeys = batch(1).unionByName(batch(2))
      .select("key").distinct().count()
    assert(t.read().count() == expectedKeys)
  }
}
