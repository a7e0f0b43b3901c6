package graft.core

import graft.Session
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-3 core work: numeric type widening through schema evolution,
  * and the CDC-format incremental read (net i/u/d changes with
  * after/before images, group-scoped diff). */
class Round3CoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String =
    graft.util.TempDirs.create("graft-r3-").toString

  private def cfg(name: String, tpe: String = TableConfig.Cow) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = None, tableType = tpe, numBuckets = 4)

  // ---- schema evolution: numeric widening ---------------------------

  test("type widening: int column widens to long, old files still read") {
    val t = GraftTable.create(spark, tmp(), cfg("widen"))
    t.insert(Seq(("K1", 1L, 7)).toDF("key", "ts", "v")
      .withColumn("v", col("v").cast(IntegerType)))
    assert(t.schema.fields.find(_.name == "v").get.dataType == IntegerType)
    // batch 2 arrives with v as LONG holding a value > Int.MaxValue:
    // narrowing to the stored int would corrupt it
    val big = 4000000000L
    t.upsert(Seq(("K2", 2L, big)).toDF("key", "ts", "v"))
    assert(t.schema.fields.find(_.name == "v").get.dataType == LongType)
    val got = t.read().select("key", "v").as[(String, Long)].collect().toMap
    assert(got == Map("K1" -> 7L, "K2" -> big))
  }

  test("type widening: incompatible arrival keeps the base type (cast-to-base)") {
    val t = GraftTable.create(spark, tmp(), cfg("nowiden"))
    t.insert(Seq(("K1", 1L, "txt")).toDF("key", "ts", "s"))
    t.upsert(Seq(("K2", 2L, 42L)).toDF("key", "ts", "s"))
    assert(t.schema.fields.find(_.name == "s").get.dataType.typeName == "string")
    val got = t.read().select("key", "s").as[(String, String)].collect().toMap
    assert(got == Map("K1" -> "txt", "K2" -> "42"))
  }

  // ---- CDC-format incremental read ----------------------------------

  private def rows(rs: (String, Long, Long)*): DataFrame =
    rs.toDF("key", "ts", "volume")

  test("readCdc classifies net insert/update/delete with correct images") {
    val t = GraftTable.create(spark, tmp(), cfg("cdc"))
    val c1 = t.insert(rows(("K1", 10L, 100L), ("K2", 10L, 200L), ("K4", 10L, 400L)))
    t.upsert(rows(("K2", 20L, 222L), ("K3", 20L, 333L))) // update + insert
    t.deleteWhere($"key" === "K1")
    val cdc = t.readCdc(fromExclusive = c1)
      .select("_change_type", "key", "ts", "volume")
      .as[(String, String, Long, Long)].collect().toSet
    assert(cdc == Set(
      ("d", "K1", 10L, 100L),   // before-image of the deleted row
      ("u", "K2", 20L, 222L),   // after-image of the update
      ("i", "K3", 20L, 333L)))  // K4 untouched → absent
  }

  test("readCdc: an update that loses the latest-wins merge is not a change") {
    val t = GraftTable.create(spark, tmp(), cfg("cdc_lose"))
    val c1 = t.insert(rows(("K1", 50L, 100L)))
    t.upsert(rows(("K1", 10L, 999L))) // older ordering → loses
    assert(t.readCdc(fromExclusive = c1).count() == 0)
  }

  test("readCdc: update-then-delete nets to a single d; empty range is empty") {
    val t = GraftTable.create(spark, tmp(), cfg("cdc_net"))
    val c1 = t.insert(rows(("K1", 10L, 100L)))
    t.upsert(rows(("K1", 20L, 200L)))
    t.deleteWhere($"key" === "K1")
    val cdc = t.readCdc(fromExclusive = c1)
      .select("_change_type", "key", "volume")
      .as[(String, String, Long)].collect().toSeq
    assert(cdc == Seq(("d", "K1", 100L))) // before-image = pre-range state
    assert(t.readCdc(fromExclusive = t.log.lastInstant().get).count() == 0)
  }

  // ---- z-order clustering -------------------------------------------

  test("z-order clustering preserves content and tightens stats on both columns") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "zord", keyField = "key", orderingField = "ts",
      partitionField = None, numBuckets = 1, statsColumns = Seq("a", "b")))
    // a, b: independent pseudo-random values — in insertion order every
    // file spans nearly the full range of both, so no stats pruning
    val n = 4096
    t.bulkInsert(spark.range(n).selectExpr(
      "cast(id as string) AS key", "id AS ts",
      "pmod(id * 2654435761, 4096) AS a",
      "pmod(id * 40503, 4096) AS b"))
    val before = t.read().orderBy("key").collect()
    val total = t.log.liveFiles().map(_.bytes).sum
    TableServices.clusterZOrder(t, Seq("a", "b"), targetFileBytes = total / 8)
    assert(t.read().orderBy("key").collect().sameElements(before))
    val files = t.log.liveFiles()
    assert(files.size >= 4, s"expected a multi-file rewrite, got ${files.size}")
    def mayContain(c: String, lo: Long, hi: Long) = files.count { f =>
      StatsPruner.mayContain(org.apache.spark.sql.types.LongType,
        f.stats.get(c), Some(lo.toString), Some(hi.toString))
    }
    // a narrow range on EITHER column skips files; the corner rectangle
    // (both columns narrow) skips most — the multi-column property a
    // single-column sort cannot give
    assert(mayContain("a", 0, 255) < files.size)
    assert(mayContain("b", 0, 255) < files.size)
    val corner = files.count { f =>
      StatsPruner.mayContain(org.apache.spark.sql.types.LongType,
        f.stats.get("a"), Some("0"), Some("255")) &&
      StatsPruner.mayContain(org.apache.spark.sql.types.LongType,
        f.stats.get("b"), Some("0"), Some("255"))
    }
    assert(corner <= files.size / 2,
      s"corner query still scans $corner of ${files.size} files")
  }

  // ---- metadata-only bootstrap --------------------------------------

  test("bootstrap adopts parquet files without rewrite; upsert folds them in") {
    val srcDir = graft.util.TempDirs.create("graft-boot-src-").toString + "/d"
    rows(("K1", 10L, 100L), ("K2", 10L, 200L), ("K3", 10L, 300L))
      .coalesce(1).write.parquet(srcDir)
    val t = GraftTable.create(spark, tmp(), cfg("boot"))
    t.bootstrapFrom(srcDir)
    // adopted metadata-only: live files sit in the unbucketed group
    assert(t.log.liveFiles().nonEmpty)
    assert(t.log.liveFiles().forall(_.bucket == GraftTable.BootstrapBucket))
    assert(t.read().select("key", "volume").as[(String, Long)].collect().toMap
      == Map("K1" -> 100L, "K2" -> 200L, "K3" -> 300L))
    // first overlapping upsert folds the bootstrap file into hashed groups
    t.upsert(rows(("K2", 20L, 222L), ("K4", 20L, 400L)))
    val got = t.read().select("key", "volume").as[(String, Long)].collect().toMap
    assert(got == Map("K1" -> 100L, "K2" -> 222L, "K3" -> 300L, "K4" -> 400L))
    assert(t.log.liveFiles().forall(_.bucket >= 0), "bootstrap file not converted")
  }

  test("bootstrap of a partitioned table derives partitions from file stats; delete works") {
    val srcDir = graft.util.TempDirs.create("graft-boot-part-").toString + "/d"
    // one file per partition value, partition COLUMN kept in the data
    Seq(("K1", "A", 10L, 1L), ("K2", "A", 10L, 2L)).toDF("key", "p", "ts", "volume")
      .coalesce(1).write.parquet(srcDir + "/a")
    Seq(("K3", "B", 10L, 3L)).toDF("key", "p", "ts", "volume")
      .coalesce(1).write.parquet(srcDir + "/b")
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "bootp", keyField = "key", orderingField = "ts",
      partitionField = Some("p"), numBuckets = 2))
    t.bootstrapFrom(srcDir)
    assert(t.partitions().toSet == Set("A", "B"))
    assert(t.read().count() == 3)
    t.deletePartitions(Seq("B"))
    assert(t.read().select("key").as[String].collect().toSet == Set("K1", "K2"))
    // a file spanning two partition values is refused
    val mixed = graft.util.TempDirs.create("graft-boot-mixed-").toString + "/d"
    Seq(("K1", "A", 1L, 1L), ("K2", "B", 1L, 2L)).toDF("key", "p", "ts", "volume")
      .coalesce(1).write.parquet(mixed)
    val t2 = GraftTable.create(spark, tmp(), TableConfig(
      name = "bootm", keyField = "key", orderingField = "ts",
      partitionField = Some("p"), numBuckets = 2))
    val ex = intercept[IllegalArgumentException](t2.bootstrapFrom(mixed))
    assert(ex.getMessage.contains("spans partition values"))
  }

  test("readCdc works over MOR delta files and refuses a restore in range") {
    val t = GraftTable.create(spark, tmp(), cfg("cdc_mor", TableConfig.Mor))
    val c1 = t.insert(rows(("K1", 10L, 100L), ("K2", 10L, 200L)))
    t.upsert(rows(("K1", 20L, 111L)))
    val cdc = t.readCdc(fromExclusive = c1)
      .select("_change_type", "key", "volume")
      .as[(String, String, Long)].collect().toSet
    assert(cdc == Set(("u", "K1", 111L)))
    val cow = GraftTable.create(spark, tmp(), cfg("cdc_rst"))
    val d1 = cow.insert(rows(("K1", 10L, 100L)))
    cow.upsert(rows(("K1", 20L, 200L)))
    TableServices.restore(cow, d1)
    val ex = intercept[IllegalStateException](cow.readCdc(d1).count())
    assert(ex.getMessage.contains("restore"))
  }
}
