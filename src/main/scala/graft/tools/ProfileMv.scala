package graft.tools

import graft.{LakehouseQueries, Tables}
import graft.core.{GraftTable, TableConfig}
import graft.operators.IncrementalMv
import org.apache.spark.sql.functions._

/** Scratch step-timer for the l20 incremental-MV gate (not part of the
  * driver contract): attributes the gate's wall time to its commits. */
object ProfileMv {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mv] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- run $round ---")
      val ev = time("load events") {
        val d = Tables.load(spark, dir, "events"); d.count(); d
      }
      val root = graft.util.TempDirs.create("graft-mvprof-").toString
      val t = GraftTable.create(spark, s"$root/base", TableConfig(
        name = "base", keyField = "event_id", orderingField = "ts",
        partitionField = Some("event_type"), tableType = TableConfig.Cow,
        numBuckets = 4))
      val mv = GraftTable.create(spark, s"$root/mv", TableConfig(
        name = "mv", keyField = "event_type", orderingField = "_refreshed",
        partitionField = None, tableType = TableConfig.Cow, numBuckets = 2))
      val c1 = time("base insert (half)") {
        t.insert(ev.filter(col("event_id") % 2 === 0))
      }
      time("mv full aggregate+insert") {
        mv.insert(IncrementalMv.fullAggregate(t.read(), "event_type", "value")
          .withColumn("_refreshed", lit(0L)))
      }
      val c2 = time("base upsert (other half)") {
        t.upsert(ev.filter(col("event_id") % 2 === 1))
        t.log.snapshot().commits.last.instant
      }
      time("refresh 1 (upsert wave)") {
        IncrementalMv.refresh(spark, mv,
          t.readCdc(c1, withPreimages = true), "event_type", "value")
      }
      time("base deleteWhere") { t.deleteWhere(col("event_type") === "click") }
      time("refresh 2 (delete wave)") {
        IncrementalMv.refresh(spark, mv,
          t.readCdc(c2, withPreimages = true), "event_type", "value")
      }
      time("mv read+collect") { mv.read().collect().length }
    }
    spark.stop()
  }
}
