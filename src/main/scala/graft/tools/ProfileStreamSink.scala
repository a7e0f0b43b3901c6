package graft.tools

import graft.Tables
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the l17 stream-sink pipeline (not part
  * of the driver contract). */
object ProfileStreamSink {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // per-job wall-clock with the callsite, to see where write time goes
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 50) println(f"[job] #${j.jobId}%-4d $ms%8.0fms  $desc")
        }
      }
    })
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[l17] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val ev = Tables.load(spark, dir, "events")
    def fresh(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val cfg = TableConfig.Cow
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val src = time("create src") { GraftTable.create(spark, fresh("pss_src"),
        TableConfig(name = "pss_src", keyField = "user_id",
        orderingField = "ts", partitionField = Some("event_type"),
        tableType = cfg, numBuckets = 4)) }
      val dst = time("create dst") { GraftTable.create(spark, fresh("pss_dst"),
        TableConfig(name = "pss_dst", keyField = "user_id",
        orderingField = "ts", partitionField = Some("event_type"),
        tableType = cfg, numBuckets = 4)) }
      time("src.insert half") { src.insert(ev.filter(col("event_id") % 2 === 0)) }
      val q = time("start stream") {
        spark.readStream.format("graft-stream").option("path", src.root).load()
          .writeStream.outputMode("append").format("graft-stream")
          .option("path", dst.root)
          .option("checkpointLocation", fresh("pss_ck"))
          .start()
      }
      try {
        time("processAllAvailable 1") { q.processAllAvailable() }
        time("src.upsert other half") { src.upsert(ev.filter(col("event_id") % 2 === 1)) }
        time("processAllAvailable 2") { q.processAllAvailable() }
      } finally q.stop()
      time("dst.read.count") { dst.read().count() }
    }
    spark.stop()
  }
}
