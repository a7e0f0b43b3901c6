package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement for incremental SemDeDup (not part of the
  * driver contract): freeze the quantizer on the sf fixture's
  * embeddings, ingest most of the corpus as the base, then time one
  * marginal batch through [[graft.operators.IncrementalSemanticDedup]]
  * vs re-running the batch operator over the grown corpus — the
  * recluster-everything cost the incremental path exists to avoid.
  * Usage: runMain graft.tools.ProfileSemDedup [batchFrac=0.1] [nLists=16]
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val frac = if (args.length > 0) args(0).toDouble else 0.1
    val nLists = if (args.length > 1) args(1).toInt else 16
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
      .cache()
    val n = embs.count()
    val cut = (frac * 1000).toInt
    val base = embs.filter(pmod(xxhash64(col("id")), lit(1000)) >= lit(cut))
    val batch = embs.filter(pmod(xxhash64(col("id")), lit(1000)) < lit(cut))
    println(s"[semdedup] corpus=$n base=${base.count()} batch=${batch.count()}")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semdedup] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = graft.util.TempDirs.create("graft-semdd-").toString
    val inc = new graft.operators.IncrementalSemanticDedup(spark, root,
      nClusters = nLists, threshold = 0.99)
    time("freeze quantizer") { inc.freeze(embs, "id", "vec") }
    time("base ingest (one-time)") {
      inc.dedupBatch(base, "id", "vec", 1L).count()
    }
    time("marginal batch (incremental)") {
      inc.dedupBatch(batch, "id", "vec", 2L).count()
    }
    val bpath = graft.util.TempDirs.create("graft-semdd-b-").toString
    time("batch operator over grown corpus (the avoided cost)") {
      graft.operators.SemanticDedup.verdicts(embs, "id", "vec",
        nClusters = nLists, threshold = 0.99, indexPath = bpath).count()
    }
    spark.stop()
  }
}
