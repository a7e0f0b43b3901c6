package graft.core

import graft.Session
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-21 core hardening (review findings): routing-column type
  * pinning, instant-collision fail-loud, restore-aware cleaning,
  * fractional-stat extremes, empty-table pruned reads, deleteRows
  * identity guard, derived-partition export layout, archive
  * idempotence. */
class Round21CoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-r21-").toString

  test("widening a routing column is rejected (re-bucketing corruption)") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "pin", keyField = "id", orderingField = "v", numBuckets = 4))
    t.insert(Seq((1, 10L), (2, 10L)).toDF("id", "v")) // int key
    // a LONG-keyed batch must not widen the stored int key: xxhash64
    // hashes int and long differently, so widening re-routes every key
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, 20L)).toDF("id", "v"))
    }
    assert(e.getMessage.contains("routing column"))
    // non-routing columns still widen (the l10 evolution contract)
    t.upsert(Seq((3, 30L)).toDF("id", "v"))
    assert(t.read().count() == 3)
  }

  test("clean never deletes files a restore re-added inside the retained window") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "cleanrestore", keyField = "id", orderingField = "v",
      numBuckets = 1, smallFileLimitBytes = 0))
    t.insert(Seq((1L, 1L)).toDF("id", "v"))
    val t1 = t.log.lastInstant().get
    t.upsert(Seq((1L, 2L)).toDF("id", "v"))   // rewrites the t1 file
    (3 to 12).foreach(i => t.upsert(Seq((1L, i.toLong)).toDF("id", "v")))
    TableServices.restore(t, t1)               // re-adds the t1 file
    t.upsert(Seq((1L, 99L)).toDF("id", "v"))   // supersedes it again
    val deleted = TableServices.clean(t, retainCommits = 3)
    // the restore and its follow-up are inside the retained window:
    // time travel to the restore instant must still read
    val restoreInstant = t.log.commits().filter(_.operation == "restore")
      .last.instant
    assert(t.read(Some(restoreInstant)).select("v").as[Long].head() == 1L)
    // and cleaning DID happen for genuinely dead middle versions
    assert(deleted.nonEmpty)
  }

  test("fractional stats with Infinity/NaN extremes stay pruned-queryable") {
    assert(StatsPruner.compare(org.apache.spark.sql.types.DoubleType,
      "-Infinity", "1.5") < 0)
    assert(StatsPruner.compare(org.apache.spark.sql.types.DoubleType,
      "Infinity", "1.5") > 0)
    assert(StatsPruner.compare(org.apache.spark.sql.types.DoubleType,
      "NaN", "Infinity") > 0) // IEEE total order: NaN largest, like Spark max()
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "inf", keyField = "id", orderingField = "v", numBuckets = 1,
      statsColumns = Seq("d")))
    t.insert(Seq((1L, 1L, 1.5), (2L, 1L, Double.PositiveInfinity),
      (3L, 1L, Double.NaN)).toDF("id", "v", "d"))
    // planning through the stats must not throw NumberFormatException
    assert(t.readWhereBetween("d", Some("1.0"), Some("2.0")).count() == 3)
    assert(t.read().count() == 3)
  }

  test("pruned reads on a never-written table return empty, not UNRESOLVED_COLUMN") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "fresh", keyField = "id", orderingField = "v", numBuckets = 1))
    assert(t.readWhereBetween("id", Some("1"), None).count() == 0)
    assert(t.readWhereIn("id", Seq("1", "2")).count() == 0)
  }

  test("deleteRows without an identity column fails loudly, not silently no-ops") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "delguard", keyField = "id", orderingField = "v",
      partitionField = Some("p"), numBuckets = 1))
    t.insert(Seq((1L, 1L, "a")).toDF("id", "v", "p"))
    val e = intercept[IllegalArgumentException] {
      t.deleteRows(Seq((1L, 1L)).toDF("id", "v")) // missing partition col
    }
    assert(e.getMessage.contains("identity column 'p'"))
    assert(t.read().count() == 1) // nothing was silently deleted
  }

  test("alterConfig cannot rename the soft-delete column") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "sdpin", keyField = "id", orderingField = "v", numBuckets = 1))
    intercept[IllegalArgumentException] {
      t.alterConfig(_.copy(softDeleteField = "_gone"))
    }
  }

  test("exportSnapshot of a derived-partition table partitions by the derived value") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "expderiv", keyField = "id", orderingField = "ts",
      partitionField = Some("ts"), partitionFormat = Some("yyyy-MM-dd"),
      partitionUnit = "s", numBuckets = 1))
    t.insert(Seq((1L, 1692000000L), (2L, 1692100000L))
      .toDF("id", "ts"))
    val dest = tmp() + "/exp"
    TableServices.exportSnapshot(t, dest)
    // hive dirs carry the DERIVED day, not one dir per raw timestamp
    val dirs = graft.util.Fs.listSeq(Paths.get(dest))
      .map(_.getFileName.toString).filter(_.startsWith("_partition_path="))
    assert(dirs.toSet == Set("_partition_path=2023-08-14",
      "_partition_path=2023-08-15"), dirs.toString)
    val back = TableServices.readExportedSnapshot(spark, dest)
    assert(back.count() == 2)
    assert(back.columns.contains("_partition_path"))
  }

  test("archive is idempotent across a crash between append and delete") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "arch", keyField = "id", orderingField = "v", numBuckets = 1))
    (1 to 8).foreach(i => t.upsert(Seq((1L, i.toLong)).toDF("id", "v")))
    val before = t.log.commits().map(_.instant)
    val n = TableServices.archive(t, retainCommits = 3)
    assert(n > 0)
    // simulate the crash remnant: a commit present in BOTH the archive
    // and the live dir (append succeeded, delete didn't)
    val archivedInstant = before.head
    val dup = Paths.get(t.root, CommitLog.Dir, s"$archivedInstant.json")
    val c = t.log.commits().find(_.instant == archivedInstant).get
    Files.write(dup, CommitLog.mapper.writeValueAsBytes(c))
    assert(t.log.commits().map(_.instant) == before) // deduped by instant
    // re-archiving reaps the remnant without duplicating archive lines
    TableServices.archive(t, retainCommits = 3)
    assert(t.log.commits().map(_.instant) == before)
    assert(!Files.exists(dup))
  }
}
