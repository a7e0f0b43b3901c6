package graft.tools

import graft.core.{GraftTable, TableConfig, TableServices}
import org.apache.spark.sql.functions._

/** Reproducible measurement behind the BASELINE.md round-27 row:
  * the cost of `CALL vector_search` AFTER a 1% upsert under (a) the
  * incremental maintenance path (CDC remove+append against frozen
  * centroids — the shipped behavior) vs (b) the pre-round-27 behavior
  * (stamp mismatch → full-corpus IVF-PQ rebuild), at a 100k × 64-dim
  * corpus. Prints one JSON line. */
object VectorMaintBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 100000L
    val root = graft.util.TempDirs.create("graft-vmaintbench-").toString
    val t = GraftTable.create(spark, root, TableConfig(name = "vmb",
      keyField = "vec_id", orderingField = "ver", numBuckets = 8))
    def emb(verExpr: String) = expr(
      s"transform(sequence(0, 63), j -> sin(vec_id * 64 + j + $verExpr) + 2.0d)")
      .cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = true))
    t.bulkInsert(spark.range(n).select($"id".as("vec_id"), lit(1L).as("ver"))
      .withColumn("embedding", emb("ver")))
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def search(path: String): Long = {
      val q = t.read().filter($"vec_id" < 10).select("vec_id", "embedding")
      graft.operators.IvfIndex.topK(spark, path, q,
        "vec_id", "embedding", k = 10, nProbe = 8).count()
    }
    // initial build (both paths share it)
    val (buildS, path) = time(
      TableServices.buildVectorIndex(t, "vec_id", "embedding", nLists = 64))
    def maint() = time(
      TableServices.buildVectorIndex(t, "vec_id", "embedding", nLists = 64))._1
    def insertNew(from: Long, cnt: Long) = t.upsert(
      spark.range(from, from + cnt).select($"id".as("vec_id"), lit(2L).as("ver"))
        .withColumn("embedding", emb("ver")))
    // the motivating case: a 10-row commit must not retrain the corpus
    insertNew(n, 10)
    val maint10 = maint()
    // 1% append-only churn (the production document-ingest shape):
    // no victims → no partition rewrite, one map-only encode pass
    insertNew(n + 10, 1000)
    val maintIns = maint()
    // 1% SCATTERED updates — the worst case for the remove step: 500
    // moved vectors touch most of the 64 list partitions, so both
    // relations rewrite nearly corpus-wide even though only 0.5% of
    // rows changed
    t.upsert(spark.range(0, 500).select($"id".as("vec_id"), lit(3L).as("ver"))
      .withColumn("embedding", emb("ver")))
    val maintUpd = maint()
    val (searchA, _) = time(search(path))
    // pre-round-27 comparator: wipe the stamp so the service pays the
    // old full-corpus rebuild, then search
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path, "instant.stamp"))
    val rebuildS = maint()
    val (searchB, _) = time(search(path))
    println(s"""{"corpus":$n,"dim":64,"initial_build_sec":${"%.2f".format(buildS)},""" +
      s""""maint_10row_sec":${"%.2f".format(maint10)},""" +
      s""""maint_1pct_insert_sec":${"%.2f".format(maintIns)},""" +
      s""""maint_0p5pct_scattered_update_sec":${"%.2f".format(maintUpd)},""" +
      s""""search_after_incremental_sec":${"%.2f".format(searchA)},""" +
      s""""full_rebuild_sec":${"%.2f".format(rebuildS)},""" +
      s""""search_after_rebuild_sec":${"%.2f".format(searchB)}}""")
    spark.stop()
  }
}
