package graft.core

import graft.Session
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** T7/§4 stats-based file skipping observability + the
  * SparkSessionExtensions entry point. */
class StatsSkippingAndExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  test("readWhereBetween lists only files whose stats range can match") {
    val t = GraftTable.create(spark,
      graft.util.TempDirs.create("graft-skip-").toString,
      TableConfig(name = "skip", keyField = "id", orderingField = "v",
        numBuckets = 2, statsColumns = Seq("v")))
    t.bulkInsert((1L to 100L).map(i => (i, i)).toDF("id", "v"))        // v 1..100
    t.bulkInsert((101L to 200L).map(i => (i, i)).toDF("id", "v"))      // v 101..200
    val all = t.log.liveFiles()
    assert(all.size == 4) // 2 commits x 2 buckets
    val pruned = t.readWhereBetween("v", lo = Some("150"), hi = None)
    // only the second commit's files can contain v >= 150
    assert(pruned.inputFiles.length == 2)
    assert(pruned.filter($"v" >= 150).count() == 51)
    // open scan sees everything
    assert(t.readWhereBetween("v", None, None).inputFiles.length == 4)
  }

  test("GraftExtensions injects SQL functions at session build (README.md:354-358 analog)") {
    spark.range(1).count() // ensure the shared context exists
    val prev = SparkSession.getDefaultSession
    // getOrCreate only applies extensions when it actually creates a
    // session, so detach the shared one first (same SparkContext)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = Session.builder("local[4]", 4)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val out = s2.sql(
        "select lang_id('der hund und die katze sind mit dem kind') as l")
        .collect()(0).getString(0)
      assert(out == "de")
      val fp = s2.sql("select size(winnow_fingerprint('a b c d e f g h i j')) as n")
        .collect()(0).getInt(0)
      assert(fp > 0)
      val sh = s2.sql("select simhash64(array(xxhash64('a'), xxhash64('b'))) as h")
        .collect()(0).getLong(0)
      assert(sh != 0L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
