package graft.tools

import graft.{Session, Tables}
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the storage-partitioned-join win from l19's table-build
  * cost: build the two co-bucketed MOR tables ONCE, then time the
  * fact⋈fact join query with SPJ on (KeyGroupedPartitioning honored —
  * zero exchanges) vs off (both merged sides shuffle into a sort-merge
  * join). Broadcast is disabled in both arms so the comparison is
  * exchange-vs-no-exchange, not join-strategy luck.
  *
  * Usage: runMain graft.tools.SpjBench <sfDir> [runs]
  * Prints one JSON line: {"spj":s,"shuffle":s,"speedup":r,"rows":n}
  */
object SpjBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = graft.util.TempDirs.create("graft-spjbench-wh-").toString
    val cat = "gcat_spjbench"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val ev = Tables.load(spark, sfDir, "events")
    def cfg(name: String) = TableConfig(name = name, keyField = "user_id",
      orderingField = "ts", partitionField = Some("event_type"),
      tableType = TableConfig.Mor, numBuckets = 4)
    def mk(name: String, mul: Double): Unit = {
      val t = GraftTable.create(spark, s"$wh/$name", cfg(name))
      val src = ev.withColumn("value", col("value") * mul)
      t.insert(src.filter(col("event_id") % 2 === 0))
      t.upsert(src.filter(col("event_id") % 2 === 1))
    }
    mk("a", 1.0); mk("b", 2.0)

    val sql =
      s"""SELECT count(*) AS n, sum(a.value + b.value) AS s
         |FROM $cat.a a JOIN $cat.b b
         |  ON a.event_type = b.event_type AND a.user_id = b.user_id""".stripMargin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def time(bucketing: Boolean): (Double, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", bucketing.toString)
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val n = spark.sql(sql).collect().head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (times.map(_._1).min, times.head._2)
    }
    val (spjS, rows) = time(bucketing = true)
    val (shufS, rows2) = time(bucketing = false)
    require(rows == rows2, s"arms disagree: $rows vs $rows2")
    println(f"""{"spj":$spjS%.3f,"shuffle":$shufS%.3f,"speedup":${shufS / spjS}%.2f,"rows":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
