package graft.tools

import graft.operators.{Dedup, IncrementalDedup}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): per-step
  * timing of the Round7Spec incremental-dedup-with-clustering sequence,
  * to locate where the wall-clock goes. */
object ProfileIncDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    docs.count()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val inc = new IncrementalDedup(spark,
      graft.util.TempDirs.create("graft-incd-prof-").toString)
    (0 until 3).foreach { i =>
      time(s"dedupBatch $i") {
        inc.dedupBatch(docs.filter(col("doc_id") % 3 === i),
          "doc_id", "text", i + 1L).count()
      }
      time(s"compactStores 64KB after $i") {
        inc.compactStores(targetFileBytes = 64 * 1024)
      }
      println(s"[profile]   band files=${inc.bandIndex.log.liveFiles().size} " +
        s"hash files=${inc.hashStore.log.liveFiles().size}")
    }
    time("batch minhashLsh full") {
      Dedup.minhashLsh(docs, "doc_id", "text").count()
    }
    time("probe bandIndex full read") { inc.bandIndex.read().inputFiles.length }
    time("probe bandIndex oneSig") {
      inc.bandIndex.readWhereIn("bsig", Nil,
        Some(Map("0" -> Seq("0")))).inputFiles.length
    }
    time("probe hashStore full read") { inc.hashStore.read().inputFiles.length }
    time("probe hashStore one id") {
      inc.hashStore.readWhereIn("id", Seq("1")).inputFiles.length
    }
    spark.stop()
  }
}
