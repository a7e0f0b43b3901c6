package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch measurement for the domainCap skew reformulation (not part
  * of the driver contract): plant a mega-domain (a configurable share
  * of all docs on ONE host — the real-crawl worst case the round-12
  * verdict flagged) at a corpus multiplier, then time
  *
  *   - the old single-window formulation
  *     (`row_number() OVER (PARTITION BY domain)`), which shuffles and
  *     sorts the mega-domain's entire doc set through one task, vs
  *   - [[graft.operators.Curation.domainCap]]'s exact two-stage salted
  *     top-N (per-(domain, hash(id)%salts) rank, then re-rank the
  *     bounded survivors),
  *
  * and assert the row sets are identical. Also prints the largest
  * single-task input row count of the first window stage for each
  * formulation — the straggler signal: the single window's max task
  * carries the whole mega-domain; the salted one carries ~1/salts of
  * it. Usage:
  *   runMain graft.tools.ProfileDomainCap [mult=100] [megaShare=0.5] [withOld=true]
  */
object ProfileDomainCap {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 100
    val megaShare = if (args.length > 1) args(1).toDouble else 0.5
    val withOld = if (args.length > 2) args(2).toBoolean else true
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val docs = (1 to mult).map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _)
      // plant the mega-domain: megaShare of docs on one host, the rest
      // spread over per-source hosts
      .withColumn("url", when(
          pmod(xxhash64(col("doc_id")), lit(1000)) < lit((megaShare * 1000).toInt),
          concat(lit("https://mega.example.com/p"), col("doc_id")))
        .otherwise(concat(lit("https://"), lower(col("source")),
          lit(".example.com/p"), col("doc_id"))))
      .cache()
    val n = docs.count()
    println(s"[domaincap] rows=$n mult=$mult megaShare=$megaShare")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[domaincap] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val newRows = time("two-stage salted (new)") {
      graft.operators.Curation.domainCap(docs, "url", "doc_id", "n_chars",
        maxPerDomain = 1000).select("domain", "doc_id").collect().toSet
    }
    println(s"[domaincap] survivors=${newRows.size}")

    if (withOld) {
      val oldRows = time("single window (old)") {
        graft.operators.Curation.canonicalizeUrls(docs, "url")
          .withColumn("domain_rank", row_number().over(
            Window.partitionBy(col("domain"))
              .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("long"))
          .filter(col("domain_rank") <= 1000)
          .select("domain", "doc_id").collect().toSet
      }
      println(s"[domaincap] identical=${oldRows == newRows}")
    }

    // straggler signal: per-task input rows of the first rank stage
    // (window partitioning = hash of its PARTITION BY keys). AQE's
    // small-partition coalescing hides the distribution at toy scale —
    // disable it for the signal only; at 100 TB nothing coalesces.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val canon = graft.operators.Curation.canonicalizeUrls(docs, "url")
    val salted = canon
      .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(64)).cast("int"))
      .repartition(col("domain"), col("__salt"))
      .groupBy(spark_partition_id().as("pid")).count()
      .agg(max("count")).first().getLong(0)
    val single = canon
      .repartition(col("domain"))
      .groupBy(spark_partition_id().as("pid")).count()
      .agg(max("count")).first().getLong(0)
    println(s"[domaincap] max task rows: single-window=$single salted=$salted " +
      f"(ratio ${single.toDouble / salted}%.1f×)")
    spark.stop()
  }
}
