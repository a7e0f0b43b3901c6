package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement for [[graft.operators.Unigram]] (not part of
  * the driver contract): corpus multiplier sweep of encodeStats. The
  * claim under test is the Bpe discipline — the corpus is touched once
  * (word histogram + the final per-doc join); everything else (piece
  * counts, vocabulary selection, the Viterbi DP) runs on the
  * DISTINCT-word relation, which does NOT grow with corpus replication
  * — so wall time should scale with the corpus passes, not with
  * (corpus × DP cost). Usage:
  *   runMain graft.tools.ProfileUnigram [mults=1,10,100] [topK=512]
  */
object ProfileUnigram {
  def main(args: Array[String]): Unit = {
    val mults = (if (args.length > 0) args(0) else "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val topK = if (args.length > 1) args(1).toInt else 512
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    mults.foreach { mult =>
      val docs = (1 to mult).map(i => base.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ union _)
      val t0 = System.nanoTime()
      val out = graft.operators.Unigram
        .encodeStats(docs, "doc_id", "text", topK)
        .agg(count(lit(1)), sum("n_pieces"), sum("cost_micronats")).first()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[unigram] mult=$mult%-4d docs=${out.getLong(0)}%-9d " +
        f"pieces=${out.getLong(1)}%-12d cost=${out.getLong(2)}%-15d " +
        f"wall=$secs%.2f s")
    }
    spark.stop()
  }
}
