package graft.core

import graft.Session
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-4 core fixes: null-safe CDC compare for bootstrap-adopted
  * rows, incremental/CDC bootstrap-crossing guards, bootstrap basename
  * collision refusal, single-column range clustering. */
class Round4CoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String =
    graft.util.TempDirs.create("graft-r4-").toString

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = None, tableType = TableConfig.Cow, numBuckets = 4)

  private def rows(rs: (String, Long, Long)*): DataFrame =
    rs.toDF("key", "ts", "volume")

  test("readCdc sees an update of a bootstrap-adopted row (null-safe compare)") {
    val srcDir = graft.util.TempDirs.create("graft-r4-boot-").toString + "/d"
    rows(("K1", 10L, 100L), ("K2", 10L, 200L), ("K3", 10L, 300L))
      .coalesce(1).write.parquet(srcDir)
    val t = GraftTable.create(spark, tmp(), cfg("cdcboot"))
    val b = t.bootstrapFrom(srcDir)
    t.upsert(rows(("K2", 20L, 222L)))
    // cursor starts AT the bootstrap instant (the only legal start);
    // adopted rows carry null _commit_time on the old side, so a
    // null-unsafe =!= would silently drop this update
    val cdc = t.readCdc(fromExclusive = b)
      .select("_change_type", "key", "volume")
      .as[(String, String, Long)].collect().toSet
    assert(cdc == Set(("u", "K2", 222L)))
  }

  test("incremental and CDC cursors refuse a range crossing a bootstrap") {
    val srcDir = graft.util.TempDirs.create("graft-r4-boot2-").toString + "/d"
    rows(("K1", 10L, 100L)).coalesce(1).write.parquet(srcDir)
    val t = GraftTable.create(spark, tmp(), cfg("bootguard"))
    val c1 = t.insert(rows(("K0", 5L, 50L)))
    t.bootstrapFrom(srcDir)
    val e1 = intercept[IllegalStateException](t.readIncremental(c1).count())
    assert(e1.getMessage.contains("bootstrap"))
    val e2 = intercept[IllegalStateException](t.readCdc(c1).count())
    assert(e2.getMessage.contains("bootstrap"))
    // a cursor starting at the bootstrap instant is fine
    assert(t.readIncremental(t.log.lastInstant().get).count() == 0)
  }

  test("bootstrapFrom refuses colliding parquet basenames") {
    val base = graft.util.TempDirs.create("graft-r4-coll-").toString
    rows(("K1", 10L, 100L)).coalesce(1).write.parquet(base + "/a")
    rows(("K2", 10L, 200L)).coalesce(1).write.parquet(base + "/b")
    // hand-rename both part files to the same basename in different dirs
    val dirA = Files.list(java.nio.file.Paths.get(base + "/a"))
    val dirB = Files.list(java.nio.file.Paths.get(base + "/b"))
    import scala.jdk.CollectionConverters._
    def renameTo(dir: String, name: String): Unit = {
      val p = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(p, p.resolveSibling(name)); ()
    }
    dirA.close(); dirB.close()
    renameTo(base + "/a", "data.parquet")
    renameTo(base + "/b", "data.parquet")
    val t = GraftTable.create(spark, tmp(), cfg("bootcoll"))
    val ex = intercept[IllegalArgumentException](t.bootstrapFrom(base))
    assert(ex.getMessage.contains("colliding"))
  }

  test("single-column clustering range-lays files on the requested column") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "cl1", keyField = "key", orderingField = "ts",
      // one bucket: range boundaries are per file GROUP, so disjoint
      // per-file ranges are only guaranteed within a group
      partitionField = None, tableType = TableConfig.Cow, numBuckets = 1,
      statsColumns = Seq("volume")))
    val n = 4000
    t.insert((1 to n).map(i => (f"K$i%05d", 1L, ((i * 7919) % n).toLong))
      .toDF("key", "ts", "volume"))
    // tiny target forces several output files
    val bytes = t.log.liveFiles().map(_.bytes).sum
    TableServices.cluster(t, targetFileBytes = bytes / 4, sortCols = Seq("volume"))
    val files = t.log.liveFiles()
    assert(files.size >= 3, s"expected several files, got ${files.size}")
    // range layout ⇒ per-file [min,max] on volume are (near-)disjoint:
    // sorted by min, each file's min must be >= the previous file's max
    val ranges = files.map { f =>
      val st = f.stats("volume"); (st.min.toLong, st.max.toLong)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(lo2 >= hi1,
        s"overlapping volume ranges: $ranges")
      case _ =>
    }
    // and the data survived intact
    assert(t.read().count() == n)
  }
}
