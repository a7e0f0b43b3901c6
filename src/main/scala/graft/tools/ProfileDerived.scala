package graft.tools

import graft.Tables
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.functions._

/** Scratch phase profile for l30 (derived partitions): split the
  * insert / upsert / read phases and report live-file counts, to see
  * where the per-file-group overhead sits. Not part of the driver
  * contract. Usage: runMain graft.tools.ProfileDerived [runs=3] */
object ProfileDerived {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 3
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = Tables.load(spark, dir, "events")
      .select("event_type", "user_id", "event_id", "ts", "value").cache()
    ev.count()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[l30] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // floor: the same rows through a BARE spark partitionBy write
    // (no engine: no window, no stats, no moves, no commit)
    (1 to 2).foreach { _ =>
      time("raw-write floor") {
        val out = graft.util.TempDirs.create("graft-l30raw-").toString
        ev.filter(col("event_id") % 2 === 0)
          .withColumn("_part", date_format(
            timestamp_micros(expr("ts DIV 1000")), "yyyy/MM/dd"))
          .withColumn("_bucket", pmod(xxhash64(col("user_id")), lit(4)))
          .repartition(col("_part"), col("_bucket"))
          .write.partitionBy("_part", "_bucket").mode("overwrite")
          .parquet(out)
      }
    }
    (1 to runs).foreach { i =>
      println(s"[l30] --- run $i ---")
      val root = graft.util.TempDirs.create("graft-l30prof-").toString
      val t = time("create") { GraftTable.create(spark, root, TableConfig(
        name = "ev_derived", keyField = "user_id", orderingField = "ts",
        partitionField = Some("ts"), partitionFormat = Some("yyyy/MM/dd"),
        partitionUnit = "ns", tableType = TableConfig.Cow, numBuckets = 4)) }
      time("insert") { t.insert(ev.filter(col("event_id") % 2 === 0)) }
      println(s"[l30] files after insert: ${t.log.liveFiles().size}")
      time("upsert") { t.upsert(ev.filter(col("event_id") % 2 === 1)) }
      println(s"[l30] files after upsert: ${t.log.liveFiles().size}")
      time("read+count") { t.read().count() }
    }
    spark.stop()
  }
}
