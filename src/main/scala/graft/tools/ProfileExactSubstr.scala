package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement for [[graft.operators.Dedup.exactSubstrExcise]]
  * (not part of the driver contract): a corpus multiplier sweep with a
  * planted BOILERPLATE window — the same 20-token run appended to a
  * configurable share of all docs, the real-crawl worst case (cookie
  * banners, license footers) that makes one window's df explode to
  * corpus scale. The mega-window stresses exactly the two choices the
  * operator's scaladoc argues for:
  *
  *   - per-window stats come from a partial-aggregating groupBy, so the
  *     mega-window's million occurrences combine map-side instead of
  *     sorting through one window task;
  *   - the flag join back to positions is a shuffle hash join AQE can
  *     split on skew.
  *
  * Prints wall time and output totals at each multiplier; linear-ish
  * growth (and no OOM) is the claim. Usage:
  *   runMain graft.tools.ProfileExactSubstr [mults=1,10,100] [boilerShare=0.5]
  */
object ProfileExactSubstr {
  def main(args: Array[String]): Unit = {
    val mults = (if (args.length > 0) args(0) else "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val boilerShare = if (args.length > 1) args(1).toDouble else 0.5
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val boiler = (1 to 20).map(i => s"boilerplate$i").mkString(" ")

    mults.foreach { mult =>
      val docs = (1 to mult).map(i => base.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ union _)
        .withColumn("text", when(
            pmod(xxhash64(col("doc_id")), lit(1000))
              < lit((boilerShare * 1000).toInt),
            concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup
        .exactSubstrExcise(docs, "doc_id", "text", windowTokens = 20)
        .agg(count(lit(1)), sum("removed_tokens")).first()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[exactsubstr] mult=$mult%-4d docs_excised=${out.getLong(0)}%-9d " +
        f"tokens_removed=${out.getLong(1)}%-11d wall=$secs%.2f s")
    }
    spark.stop()
  }
}
