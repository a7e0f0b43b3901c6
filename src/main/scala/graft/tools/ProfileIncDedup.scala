package graft.tools

import graft.operators.{Dedup, IncrementalDedup}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): the
  * marginal-batch cost of incremental dedup against an established
  * corpus, vs recomputing the batch operator from scratch — the
  * crossover VERDICT r6 asked to measure and r7 made prunable.
  *
  * Shape: 99% of the corpus is ingested as `SPARK_GRAFT_BATCHES`
  * history batches (default 9); the stores are compacted ONCE after
  * the history (periodic maintenance, not per-batch — per-batch
  * clustering is an O(corpus) rewrite and never the intended cadence),
  * sized by `SPARK_GRAFT_TARGET_MB` (default 8 MB — each band
  * partition splits into multiple bsig-sliced files at test SFs, the
  * layout the stats prune wants; at real scale the 1 GiB default
  * produces the same shape because partitions are huge). Then the
  * MARGINAL 1% batch is timed — the steady-state trickle-ingest cost
  * of admitting new documents against the full history — and compared
  * against what it replaces: recomputing the batch dedup over the
  * whole corpus.
  */
object ProfileIncDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "9").toInt
    val targetMb = sys.env.getOrElse("SPARK_GRAFT_TARGET_MB", "8").toLong
    // SPARK_GRAFT_TEXT_MULT stretches every document ×m (repetition —
    // shingle sets and near-dup structure are preserved; only text
    // VOLUME grows). This is the variable the incremental-vs-recompute
    // crossover actually depends on: recompute re-shingles the whole
    // corpus (cost ∝ text bytes), while the marginal batch reads the
    // band index (32 small rows per doc, INDEPENDENT of text length).
    // The stock synthetic docs are ~230 chars — far shorter than any
    // real training corpus — so m>1 restores a realistic ratio.
    val textMult = sys.env.getOrElse("SPARK_GRAFT_TEXT_MULT", "1").toInt
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val docs = (if (textMult <= 1) base
      else base.withColumn("text",
        org.apache.spark.sql.functions.expr(
          s"array_join(array_repeat(text, $textMult), ' ')"))).cache()
    println(s"[profile] docs=${docs.count()} batches=$nBatches " +
      s"target=${targetMb}MB textMult=$textMult")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val inc = new IncrementalDedup(spark,
      graft.util.TempDirs.create("graft-incd-prof-").toString)
    // history: 99% of the corpus in nBatches batches, then one
    // maintenance pass
    val hist = docs.filter(col("doc_id") % 100 < 99)
    time(s"history 99% ($nBatches batches)") {
      (0 until nBatches).foreach { i =>
        inc.dedupBatch(hist.filter(col("doc_id") % nBatches === i),
          "doc_id", "text", i + 1L).count()
      }
    }
    time("compactStores (periodic maintenance)") {
      inc.compactStores(targetFileBytes = targetMb << 20)
    }
    println(s"[profile]   band files=${inc.bandIndex.log.liveFiles().size} " +
      s"hash files=${inc.hashStore.log.liveFiles().size}")
    // the number that matters: the steady-state trickle batch (1% of
    // corpus) admitted against the full history — with per-step timing
    spark.conf.set("spark.graft.incdedup.debugTiming", "true")
    val marginal = time("MARGINAL 1% batch (pruned scans)") {
      inc.dedupBatch(docs.filter(col("doc_id") % 100 === 99),
        "doc_id", "text", nBatches + 1L).count()
    }
    spark.conf.set("spark.graft.incdedup.debugTiming", "false")
    println(s"[profile]   marginal-batch pairs=$marginal")
    time("RECOMPUTE batch minhashLsh full") {
      Dedup.minhashLsh(docs, "doc_id", "text").count()
    }
    // visibility into the prune (the spec asserts these relations)
    time("probe bandIndex full read") {
      println(s"[profile]   full=${inc.bandIndex.read().inputFiles.length} files")
    }
    time("probe bandIndex one sig") {
      println(s"[profile]   oneSig=${inc.bandIndex.readWhereIn("bsig", Nil,
        Some(Map("0" -> Seq("0")))).inputFiles.length} files")
    }
    time("probe hashStore one id") {
      println(s"[profile]   oneId=${inc.hashStore.readWhereIn("id", Seq("1"))
        .inputFiles.length} files")
    }
    spark.stop()
  }
}
