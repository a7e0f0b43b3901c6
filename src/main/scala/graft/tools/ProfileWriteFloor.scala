package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Floor experiment: what does the bare Spark equivalent of one
  * graft commit's shuffle+write cost, without the engine around it?
  * Compares three shapes over the same 50k-row batch:
  *   raw      — repartition(part,bucket) + partitionBy write
  *   +window  — the in-shuffle latest-wins lag() on top
  *   +bloom   — plus the key bloom filter option
  * Not part of the driver contract. */
object ProfileWriteFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = Tables.load(spark, dir, "events").filter(col("event_id") % 2 === 0)
    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[floor] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
    }
    val keyed = ev
      .withColumn("_part", col("event_type"))
      .withColumn("_bucket", pmod(xxhash64(col("user_id")), lit(4)).cast("int"))
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      time("raw write") {
        keyed.repartition(col("_part"), col("_bucket"))
          .write.partitionBy("_part", "_bucket").mode("overwrite")
          .parquet(graft.util.TempDirs.create("graft-floor-").toString)
      }
      time("raw+window") {
        val w = Window.partitionBy(col("_part"), col("_bucket"))
          .orderBy(col("user_id").asc, col("ts").desc_nulls_last)
        keyed.repartition(col("_part"), col("_bucket"))
          .withColumn("__prevk", lag(col("user_id"), 1).over(w))
          .filter(col("__prevk").isNull || col("__prevk") =!= col("user_id"))
          .drop("__prevk")
          .write.partitionBy("_part", "_bucket").mode("overwrite")
          .parquet(graft.util.TempDirs.create("graft-floor-").toString)
      }
      time("raw+window+bloom") {
        val w = Window.partitionBy(col("_part"), col("_bucket"))
          .orderBy(col("user_id").asc, col("ts").desc_nulls_last)
        keyed.repartition(col("_part"), col("_bucket"))
          .withColumn("__prevk", lag(col("user_id"), 1).over(w))
          .filter(col("__prevk").isNull || col("__prevk") =!= col("user_id"))
          .drop("__prevk")
          .write.partitionBy("_part", "_bucket").mode("overwrite")
          .option("parquet.bloom.filter.enabled#user_id", "true")
          .option("parquet.bloom.filter.adaptive.enabled", "true")
          .parquet(graft.util.TempDirs.create("graft-floor-").toString)
      }
      time("noop compute only") {
        val w = Window.partitionBy(col("_part"), col("_bucket"))
          .orderBy(col("user_id").asc, col("ts").desc_nulls_last)
        keyed.repartition(col("_part"), col("_bucket"))
          .withColumn("__prevk", lag(col("user_id"), 1).over(w))
          .filter(col("__prevk").isNull || col("__prevk") =!= col("user_id"))
          .drop("__prevk")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
