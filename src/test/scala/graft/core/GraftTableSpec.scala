package graft.core

import graft.Session
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Core lakehouse semantics, mirroring the reference demo's golden flow
  * (stock_ticks COW/MOR, hudi-spark-minio-trino/README.md:380-419,
  * 744-776, 966-984, 1196-1216) on a synthesized mini-fixture with the
  * same shape: key = symbol+hour, partition = date, ordering = ts.
  */
class GraftTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String =
    graft.util.TempDirs.create("graft-test-").toString

  private def ticks(rows: (String, String, String, String, Long)*): DataFrame =
    rows.toDF("key", "symbol", "ts", "date", "volume")

  // batch 1: GOOG through 10:29, MSFT through 10:29  (two partitions' worth
  // of hours compressed into one date partition, like the demo)
  private def batch1 = ticks(
    ("GOOG_09", "GOOG", "2018-08-31 09:59:00", "2018/08/31", 6330L),
    ("GOOG_10", "GOOG", "2018-08-31 10:29:00", "2018/08/31", 3391L),
    ("MSFT_09", "MSFT", "2018-08-31 09:59:00", "2018/08/31", 5000L),
    ("MSFT_10", "MSFT", "2018-08-31 10:29:00", "2018/08/31", 6000L))

  // batch 2: updates the 10-o'clock keys to 10:59 (the demo's update wave)
  private def batch2 = ticks(
    ("GOOG_10", "GOOG", "2018-08-31 10:59:00", "2018/08/31", 9021L),
    ("MSFT_10", "MSFT", "2018-08-31 10:59:00", "2018/08/31", 7000L))

  private def cfg(name: String, tpe: String) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = Some("date"), tableType = tpe, numBuckets = 4)

  private def maxTs(df: DataFrame, symbol: String): String =
    df.filter($"symbol" === symbol).agg(max($"ts")).as[String].head()

  test("COW: insert then upsert, snapshot reflects latest-wins (golden 10:29 -> 10:59)") {
    val t = GraftTable.create(spark, tmp(), cfg("st_cow", TableConfig.Cow))
    t.insert(batch1)
    assert(maxTs(t.read(), "GOOG") == "2018-08-31 10:29:00")
    assert(t.read().count() == 4)
    t.upsert(batch2)
    assert(maxTs(t.read(), "GOOG") == "2018-08-31 10:59:00")
    // update-in-place: still 4 rows, no duplicate keys
    assert(t.read().count() == 4)
    assert(t.read().groupBy("key").count().filter($"count" > 1).count() == 0)
    // updated row carries the new volume
    assert(t.read().filter($"key" === "GOOG_10").select("volume").as[Long].head() == 9021L)
  }

  test("MOR: RO stale vs RT fresh, compaction converges (README.md:728-730, 1196-1216)") {
    val t = GraftTable.create(spark, tmp(), cfg("st_mor", TableConfig.Mor))
    t.insert(batch1)
    t.upsert(batch2)
    assert(maxTs(t.readOptimized(), "GOOG") == "2018-08-31 10:29:00") // base only
    assert(maxTs(t.readRealtime(), "GOOG") == "2018-08-31 10:59:00")  // merged
    assert(t.readRealtime().count() == 4)
    val compacted = TableServices.compact(t)
    assert(compacted.nonEmpty)
    assert(maxTs(t.readOptimized(), "GOOG") == "2018-08-31 10:59:00") // converged
    assert(t.readOptimized().count() == 4)
    assert(t.log.liveFiles().forall(!_.delta))
  }

  test("incremental read returns exactly the post-commit changes (README.md:982-984)") {
    val t = GraftTable.create(spark, tmp(), cfg("st_incr", TableConfig.Cow))
    val c1 = t.insert(batch1)
    t.upsert(batch2)
    val inc = t.readIncremental(fromExclusive = c1)
    assert(inc.count() == 2) // only the two updated keys
    assert(inc.select("key").as[String].collect().toSet == Set("GOOG_10", "MSFT_10"))
    assert(maxTs(inc, "GOOG") == "2018-08-31 10:59:00")
    // from before everything = full snapshot
    assert(t.readIncremental("0").count() == 4)
    // maxCommits windowing: only the first commit's rows
    assert(t.readIncremental("0", maxCommits = 1).count() == 4)
  }

  test("delete by predicate (COW) and by rows (MOR tombstones)") {
    val cow = GraftTable.create(spark, tmp(), cfg("del_cow", TableConfig.Cow))
    cow.insert(batch1)
    cow.deleteWhere(col("symbol") === "MSFT")
    assert(cow.read().count() == 2)
    assert(cow.read().select("symbol").distinct().as[String].collect().toSeq == Seq("GOOG"))

    val mor = GraftTable.create(spark, tmp(), cfg("del_mor", TableConfig.Mor))
    mor.insert(batch1)
    mor.deleteWhere(col("key") === "GOOG_10")
    assert(mor.readRealtime().count() == 3)          // tombstone wins the merge
    assert(mor.readOptimized().count() == 4)         // base untouched
    TableServices.compact(mor)
    assert(mor.readOptimized().count() == 3)         // physically gone
  }

  test("insert_overwrite replaces only touched partitions; delete_partition drops (D6/D8)") {
    val t = GraftTable.create(spark, tmp(), cfg("ovw", TableConfig.Cow))
    t.insert(ticks(
      ("A_1", "A", "t1", "2018/08/30", 1L),
      ("B_1", "B", "t1", "2018/08/31", 2L)))
    t.insertOverwrite(ticks(("C_1", "C", "t2", "2018/08/31", 3L)))
    assert(t.read().select("key").as[String].collect().toSet == Set("A_1", "C_1"))
    assert(t.partitions() == Seq("2018/08/30", "2018/08/31"))
    t.deletePartitions(Seq("2018/08/31"))
    assert(t.read().select("key").as[String].collect().toSet == Set("A_1"))
    assert(t.partitions() == Seq("2018/08/30"))
    t.insertOverwriteTable(ticks(("Z_1", "Z", "t9", "2019/01/01", 9L)))
    assert(t.read().select("key").as[String].collect().toSet == Set("Z_1"))
  }

  test("schema evolution: later batch adds a column, old rows read as null") {
    val t = GraftTable.create(spark, tmp(), cfg("evo", TableConfig.Cow))
    t.insert(batch1)
    val withExtra = batch2.withColumn("haversine_distance", lit(12.5))
    t.upsert(withExtra)
    val snap = t.read()
    assert(snap.columns.contains("haversine_distance"))
    assert(snap.filter($"key" === "GOOG_09")
      .select("haversine_distance").first().isNullAt(0))
    assert(snap.filter($"key" === "GOOG_10")
      .select("haversine_distance").as[Double].head() == 12.5)
  }

  test("time travel + cleaning") {
    val t = GraftTable.create(spark, tmp(), cfg("tt", TableConfig.Cow))
    val c1 = t.insert(batch1)
    t.upsert(batch2)
    assert(maxTs(t.read(Some(c1)), "GOOG") == "2018-08-31 10:29:00")
    // cleaning with a tiny retention: obsolete files go away, snapshot still reads
    val deleted = TableServices.clean(t, retainCommits = 1)
    assert(deleted.nonEmpty)
    assert(maxTs(t.read(), "GOOG") == "2018-08-31 10:59:00")
    assert(t.read().count() == 4)
  }

  test("clustering sorts within file groups and preserves content") {
    val t = GraftTable.create(spark, tmp(), cfg("clu", TableConfig.Cow))
    t.insert(batch1)
    t.insert(ticks(("AAPL_09", "AAPL", "2018-08-31 09:30:00", "2018/08/31", 1L)))
    val before = t.read().count()
    assert(TableServices.cluster(t).nonEmpty)
    assert(t.read().count() == before)
    // one base file per non-empty group after clustering
    val groups = t.log.liveFiles().groupBy(f => (f.partition, f.bucket))
    assert(groups.values.forall(_.size == 1))
  }

  test("commit timeline archival keeps state intact") {
    val t = GraftTable.create(spark, tmp(), cfg("arc", TableConfig.Cow))
    (1 to 5).foreach(i => t.insert(ticks((s"K_$i", "K", s"t$i", "2018/08/31", i.toLong))))
    val before = t.read().count()
    assert(TableServices.archive(t, retainCommits = 2) == 3)
    assert(t.log.commits().size == 5)     // archived commits still visible
    assert(t.read().count() == before)
  }

  test("views register like hive-sync: t, t_ro, t_rt (README.md:341-344)") {
    val t = GraftTable.create(spark, tmp(), cfg("stock_ticks_mor", TableConfig.Mor))
    t.insert(batch1)
    t.upsert(batch2)
    t.registerViews()
    val ro = spark.sql(
      "select symbol, max(ts) as m from stock_ticks_mor_ro group by symbol having symbol = 'GOOG'")
    val rt = spark.sql(
      "select symbol, max(ts) as m from stock_ticks_mor_rt group by symbol having symbol = 'GOOG'")
    assert(ro.as[(String, String)].head()._2 == "2018-08-31 10:29:00")
    assert(rt.as[(String, String)].head()._2 == "2018-08-31 10:59:00")
  }
}
