package graft.tools

import graft.Tables
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.functions._

/** Phase-level timing of the l-family write pipeline (insert → upsert →
  * snapshot read) — where does a commit's wall time go? Not part of the
  * driver contract. */
object ProfileWritePath {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.write.timing", "true")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[wp] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    sys.env.get("SPARK_GRAFT_WP_BLOOM").foreach(v =>
      spark.conf.set("spark.graft.write.bloom", v))
    val reps = sys.env.getOrElse("SPARK_GRAFT_WP_REPS", "3").toInt
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep: l1-shape (plain partitions) ---")
      val ev = time("load events")(Tables.load(spark, dir, "events"))
      val t = GraftTable.create(spark,
        graft.util.TempDirs.create("graft-wp-").toString,
        TableConfig(name = "wp", keyField = "user_id", orderingField = "ts",
          partitionField = Some("event_type"), tableType = TableConfig.Cow,
          numBuckets = 4))
      time("insert even")(t.insert(ev.filter(col("event_id") % 2 === 0)))
      time("upsert odd")(t.upsert(ev.filter(col("event_id") % 2 === 1)))
      time("read+count")(t.read().count())

      println(s"--- rep $rep: l30-shape (derived partitions) ---")
      val td = GraftTable.create(spark,
        graft.util.TempDirs.create("graft-wpd-").toString,
        TableConfig(name = "wpd", keyField = "user_id", orderingField = "ts",
          partitionField = Some("ts"), partitionFormat = Some("yyyy/MM/dd"),
          partitionUnit = "ns", tableType = TableConfig.Cow, numBuckets = 4))
      time("d insert even")(td.insert(ev.filter(col("event_id") % 2 === 0)))
      time("d upsert odd")(td.upsert(ev.filter(col("event_id") % 2 === 1)))
      time("d read+count")(td.read().count())
    }
    spark.stop()
  }
}
