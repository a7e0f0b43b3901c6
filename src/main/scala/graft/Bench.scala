package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set
  * against SPARK_GRAFT_SF_DIR on local[SPARK_GRAFT_CPUS] and prints
  * ONE JSON line with per-query seconds.
  *
  * Headline set = one representative per operator family, excluding
  * redundant variants (l2-l4 rebuild the same table l1 builds; p2/p5
  * are the exact verifiers of the scale paths p3/p6 and are
  * quadratic by design — correctness-gated, not raced).
  */
object Bench {

  private val headline = Seq(
    // analytics surface (§2.2-2.5)
    "q1_pricing_summary", "q2_group_max_having", "q3_proj_filter",
    "q4_range_filter", "q5_join_agg", "q6_latest_per_key",
    "q7_count", "q8_dup_check",
    // lakehouse write/read pipeline (§2.1, §2.6, §2.9)
    "l1_cow_upsert_snapshot", "l5_incremental",
    "l14_mor_catalog_snapshot",
    // training-data pipeline (north star)
    "p1_dedup_exact", "p3_dedup_minhash_lsh", "p6_ann_brute_topk",
    "p7_ann_lsh_topk", "p14_ann_ivf_topk",
    "p8_text_quality", "p11_token_count")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/session startup before timing
    spark.range(1000).selectExpr("sum(id)").collect()

    val qs = SparkEntry.queries
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val n = try qs(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
      }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (n < 0) -1.0 else dt)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
