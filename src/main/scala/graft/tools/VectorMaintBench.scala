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
    // ---- tombstone query-cost envelope (round-28): the price of the
    // anti-join + resident superseded versions as dead rows accumulate
    // from ~0% to the 20% fold point, and the post-fold recovery. Each
    // step updates a fresh id range so the tombstone count is the
    // range size; corpusCount grows by the appended versions, so the
    // fractions land at ~9% / ~18% / fold.
    def tombStats() = {
      val dir = java.nio.file.Paths.get(path, "tombstones")
      val tc = if (!java.nio.file.Files.isDirectory(dir)) 0L
        else spark.read.parquet(dir.toString).count()
      val cc = graft.operators.IvfIndex.meta(path).map(_.corpusCount).getOrElse(0L)
      (tc, cc)
    }
    def updateRange(from: Long, until: Long, ver: Long): Double = {
      t.upsert(spark.range(from, until).select(
        $"id".as("vec_id"), lit(ver).as("ver"))
        .withColumn("embedding", emb("ver")))
      maint()
    }
    updateRange(0, 10000, 4) // ~9% tombstones (10k / 110k-ish corpus)
    val (tomb9, corp9) = tombStats()
    val (search9, _) = time(search(path))
    updateRange(10000, 22000, 4) // ~18%
    val (tomb18, corp18) = tombStats()
    val (search18, _) = time(search(path))
    updateRange(22000, 30000, 4) // crosses 20% → the maintenance folds
    val (tombF, corpF) = tombStats()
    val (searchF, _) = time(search(path))
    // pre-round-27 comparator: wipe the stamp so the service pays the
    // old full-corpus rebuild, then search
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path, "instant.stamp"))
    val rebuildS = maint()
    val (searchB, _) = time(search(path))
    def pct(tc: Long, cc: Long) = "%.1f".format(100.0 * tc / math.max(cc, 1L))
    println(s"""{"corpus":$n,"dim":64,"initial_build_sec":${"%.2f".format(buildS)},""" +
      s""""maint_10row_sec":${"%.2f".format(maint10)},""" +
      s""""maint_1pct_insert_sec":${"%.2f".format(maintIns)},""" +
      s""""maint_0p5pct_scattered_update_sec":${"%.2f".format(maintUpd)},""" +
      s""""search_after_incremental_sec":${"%.2f".format(searchA)},""" +
      s""""tomb_pct_a":${pct(tomb9, corp9)},"search_tomb_a_sec":${"%.2f".format(search9)},""" +
      s""""tomb_pct_b":${pct(tomb18, corp18)},"search_tomb_b_sec":${"%.2f".format(search18)},""" +
      s""""tomb_pct_post_fold":${pct(tombF, corpF)},""" +
      s""""search_post_fold_sec":${"%.2f".format(searchF)},""" +
      s""""full_rebuild_sec":${"%.2f".format(rebuildS)},""" +
      s""""search_after_rebuild_sec":${"%.2f".format(searchB)}}""")
    spark.stop()
  }
}
