package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement for the round-26 scalable MMR
  * ([[graft.operators.Similarity.mmrSelectClustered]]): the guarded
  * greedy's k=100 envelope point vs the clustered path at the same k,
  * then the k=500 point the guarded path REFUSES (maxK=128) — the
  * BASELINE.md round-26 rows.
  *
  * Usage: runMain graft.tools.ProfileMmrClustered [corpusMult=1]
  */
object ProfileMmrClustered {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 1
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base0 = graft.Tables.load(spark, dir, "embeddings")
    val embs = (if (mult <= 1) base0.select("vec_id", "embedding")
      else (1 until mult).map { m =>
        base0.select(
          (col("vec_id") + lit(m * 1000000L)).as("vec_id"),
          transform(col("embedding"), x =>
            x + (xxhash64(col("vec_id") * lit(m)) % 1000).cast("float")
              / lit(1e6f)).as("embedding"))
      }.foldLeft(base0.select("vec_id", "embedding"))(_ unionByName _))
      .cache()
    val n = embs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mmrclustered] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val q0 = embs.filter(col("vec_id") === 0).select("embedding").first()
      .getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray
    // warm (parquet footers, codegen)
    graft.operators.Similarity.mmrSelectClustered(embs, "vec_id",
      "embedding", q0, k = 8, numClusters = 8, poolPerCluster = 64).count()
    time(s"mmrSelect k=100 over $n candidates (guarded greedy)") {
      graft.operators.Similarity.mmrSelect(embs, "vec_id", "embedding",
        q0, k = 100).count()
    }
    time(s"mmrSelectClustered k=100 over $n (clusters=8, pool=8x256)") {
      graft.operators.Similarity.mmrSelectClustered(embs, "vec_id",
        "embedding", q0, k = 100, numClusters = 8,
        poolPerCluster = 256).count()
    }
    time(s"mmrSelectClustered k=500 over $n (clusters=8, pool=8x256)") {
      graft.operators.Similarity.mmrSelectClustered(embs, "vec_id",
        "embedding", q0, k = 500, numClusters = 8,
        poolPerCluster = 256).count()
    }
    spark.stop()
  }
}
