package graft.core

import graft.Session
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Shapes the demo flow doesn't hit: unpartitioned tables
  * (NonpartitionedKeyGenerator, hoodie.properties:20), null partition
  * values, empty batches, empty-table operations, numeric keys with
  * range pruning, wide/nullable rows (the COMPLEX fixture shape). */
class EdgeCasesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-edge-").toString

  test("unpartitioned table: full CRUD + incremental") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "nopart", keyField = "id", orderingField = "v", numBuckets = 4))
    val c1 = t.insert(Seq((1L, 10L), (2L, 10L)).toDF("id", "v"))
    t.upsert(Seq((2L, 20L), (3L, 10L)).toDF("id", "v"))
    assert(t.read().count() == 3)
    assert(t.read().filter($"id" === 2).select("v").as[Long].head() == 20L)
    assert(t.partitions() == Seq("all"))
    t.deleteWhere($"id" === 1)
    assert(t.read().select("id").as[Long].collect().toSet == Set(2L, 3L))
    val inc = t.readIncremental(c1)
    assert(inc.select("id").as[Long].collect().toSet == Set(2L, 3L))
    t.updateWhere($"id" === 3, Map("v" -> lit(99L)))
    assert(t.read().filter($"id" === 3).select("v").as[Long].head() == 99L)
  }

  test("null partition values route to the __null__ partition and read back") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "nullpart", keyField = "id", orderingField = "v",
      partitionField = Some("p"), numBuckets = 2))
    t.insert(Seq((1L, 1L, "a"), (2L, 1L, null)).toDF("id", "v", "p"))
    assert(t.read().count() == 2)
    assert(t.partitions().contains("__null__"))
    assert(t.read().filter($"p".isNull).select("id").as[Long].head() == 2L)
    // upsert into the null partition still merges by key
    t.upsert(Seq((2L, 5L, null)).toDF("id", "v", "p"))
    assert(t.read().filter($"p".isNull).select("v").as[Long].head() == 5L)
    assert(t.read().count() == 2)
  }

  test("empty batches and empty-table operations are no-ops, not errors") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "empty", keyField = "id", orderingField = "v", numBuckets = 2))
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    t.insert(empty)
    t.upsert(empty)
    assert(t.read().count() == 0)
    t.deleteWhere($"id" === 1)            // delete on empty table
    assert(t.read().count() == 0)
    assert(t.readIncremental("0").count() == 0)
    t.insert(Seq((1L, 1L)).toDF("id", "v"))
    t.upsert(empty)                        // empty upsert after data
    assert(t.read().count() == 1)
  }

  test("numeric keys: range pruning compares numerically, not lexically") {
    // keys 9 and 10: string-compare would order "10" < "9" and break
    // file skipping; StatsPruner must use the column's numeric order
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "numkey", keyField = "id", orderingField = "v", numBuckets = 1))
    t.insert(Seq((9L, 1L), (100L, 1L)).toDF("id", "v"))
    t.upsert(Seq((10L, 7L)).toDF("id", "v"))
    assert(t.read().count() == 3)
    assert(t.read().filter($"id" === 10).select("v").as[Long].head() == 7L)
    val f = t.log.liveFiles().head
    assert(StatsPruner.rangesOverlap(
      org.apache.spark.sql.types.LongType, f.minKey, f.maxKey, "10", "10"))
  }

  test("wide nullable rows (COMPLEX fixture shape) round-trip with soft delete") {
    val df = Seq(
      (1L, 1L, Some("x"), Some(1.5), Seq("a", "b"), false),
      (2L, 1L, None, None, Seq.empty[String], false))
      .toDF("id", "ord", "s", "d", "arr", "_is_deleted")
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "wide", keyField = "id", orderingField = "ord", numBuckets = 2))
    t.insert(df)
    assert(t.read().count() == 2)
    assert(t.read().filter($"id" === 2).select("s").first().isNullAt(0))
    // soft delete via flag upsert (hoodie-schema.avsc:140-143 analog)
    t.upsert(Seq((1L, 2L, Option.empty[String], Option.empty[Double],
      Seq.empty[String], true)).toDF("id", "ord", "s", "d", "arr", "_is_deleted"))
    assert(t.read().select("id").as[Long].collect().toSet == Set(2L))
  }

  test("adversarial partition values never escape the table root") {
    // a string partition VALUE is row data — '../../x' or 'a/b' must
    // percent-encode, not become real directory nesting (writes AND the
    // later clean/remove commits would otherwise touch foreign paths)
    val root = tmp()
    val t = GraftTable.create(spark, root, TableConfig(
      name = "trav", keyField = "id", orderingField = "v",
      partitionField = Some("p"), numBuckets = 1))
    t.insert(Seq((1L, 1L, "../../evil"), (2L, 1L, "a/b"), (3L, 1L, ".."),
      (4L, 1L, ".")).toDF("id", "v", "p"))
    val rootPath = java.nio.file.Paths.get(root).toRealPath()
    import scala.jdk.CollectionConverters._
    Files.walk(rootPath).iterator().asScala.foreach { p =>
      assert(p.toRealPath().startsWith(rootPath), s"escaped root: $p")
    }
    // nothing landed beside the table root either
    val parent = rootPath.getParent
    assert(Files.list(parent).iterator().asScala
      .count(_.getFileName.toString.startsWith("evil")) == 0)
    // and the values round-trip intact through read + partition listing
    assert(t.read().orderBy("id").select("p").as[String].collect().toSeq ==
      Seq("../../evil", "a/b", "..", "."))
    assert(t.read().filter($"p" === "../../evil").count() == 1)
    // derived layouts still nest for real (format controls the segments)
    val d = GraftTable.create(spark, tmp(), TableConfig(
      name = "derived", keyField = "id", orderingField = "v",
      partitionField = Some("ts"), partitionFormat = Some("yyyy/MM/dd"),
      partitionUnit = "s", numBuckets = 1))
    d.insert(Seq((1L, 1L, 1692000000L)).toDF("id", "v", "ts"))
    assert(d.partitions() == Seq("2023/08/14"))
  }

  test("MOR: delta-only table (no base) reads and compacts") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "deltaonly", keyField = "id", orderingField = "v",
      tableType = TableConfig.Mor, numBuckets = 2))
    t.upsert(Seq((1L, 1L)).toDF("id", "v"))   // first write is a delta
    assert(t.readRealtime().count() == 1)
    assert(t.readOptimized().count() == 0)     // no base yet
    TableServices.compact(t)
    assert(t.readOptimized().count() == 1)
  }
}
