package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents").cache()
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("shingle_hashes") {
      docs.select(col("doc_id"), shingleHashes(col("text"), 5).as("h"))
        .selectExpr("sum(size(h))").collect()(0).getLong(0)
    }
    time("minhash_sig_128") {
      docs.select(col("doc_id"),
          minhashSignature(shingleHashes(col("text"), 5), 128).as("sig"))
        .selectExpr("sum(size(sig))").collect()(0).getLong(0)
    }
    time("minhash_sig_via_col") {
      docs.select(col("doc_id"), shingleHashes(col("text"), 5).as("h"))
        .select(col("doc_id"), minhashSignature(col("h"), 128).as("sig"))
        .selectExpr("sum(size(sig))").collect()(0).getLong(0)
    }
    spark.stop()
  }
}
