package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement for IVF-PQ incremental maintenance (not part of
  * the driver contract): build the index over the sf fixture's
  * embeddings, then time appending a fraction of the corpus as a new
  * batch vs rebuilding from scratch over the grown corpus. Usage:
  *   runMain graft.tools.ProfileIvfAppend [batchFrac=0.1]
  */
object ProfileIvfAppend {
  def main(args: Array[String]): Unit = {
    val frac = if (args.length > 0) args(0).toDouble else 0.1
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      .cache()
    val n = embs.count()
    val batch = embs.filter(pmod(xxhash64(col("id")), lit(1000)) < lit((frac * 1000).toInt))
      .withColumn("id", col("id") + lit(1000000000L))
    val bn = batch.count()
    println(s"[ivfappend] corpus=$n batch=$bn frac=$frac")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfappend] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val p1 = graft.util.TempDirs.create("graft-ivfapp-").toString + "/idx"
    time("full build (corpus)") {
      graft.operators.IvfPq.build(embs, "id", "vec", nLists = 16, m = 8,
        codesPerSub = 16, path = p1)
    }
    val st = time("append (batch only)") {
      graft.operators.IvfPq.append(batch, "id", "vec", p1)
    }
    println(s"[ivfappend] $st")
    spark.stop()
  }
}
