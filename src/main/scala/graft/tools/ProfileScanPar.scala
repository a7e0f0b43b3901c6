package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Quantifies the single-row-group scan bottleneck: the fixtures are
  * one-row-group parquet files, so everything fused into the scan stage
  * runs in one task. Measures heavy map work with and without a
  * repartition between scan and transform. Not part of the contract. */
object ProfileScanPar {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[sp] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3fs rows=$n")
    }
    val docs = Tables.load(spark, dir, "documents")
    println("docs scan partitions: " + docs.rdd.getNumPartitions)
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      time("bigram explode, fused")(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").count().count())
      time("bigram explode, repart32")(
        docs.repartition(32)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").count().count())
      time("shingle+minhash, fused")(
        docs.select(col("doc_id"),
            graft.functions.TextFunctions.minhashSignature(
              graft.functions.TextFunctions.shingleHashes(col("text"), 5), 128).as("s"))
          .selectExpr("sum(size(s))").count())
      time("shingle+minhash, repart32")(
        docs.repartition(32)
          .select(col("doc_id"),
            graft.functions.TextFunctions.minhashSignature(
              graft.functions.TextFunctions.shingleHashes(col("text"), 5), 128).as("s"))
          .selectExpr("sum(size(s))").count())
      time("md5 windows, fused")(
        docs.select(col("doc_id"), split(col("text"), " ", -1).as("toks"))
          .filter(size(col("toks")) >= 20)
          .select(explode(expr(
            "transform(sequence(1, size(toks) - 19), i -> md5(array_join(slice(toks, i, 20), ' ')))").as("h")))
          .count())
      time("md5 windows, repart32")(
        docs.repartition(32)
          .select(col("doc_id"), split(col("text"), " ", -1).as("toks"))
          .filter(size(col("toks")) >= 20)
          .select(explode(expr(
            "transform(sequence(1, size(toks) - 19), i -> md5(array_join(slice(toks, i, 20), ' ')))").as("h")))
          .count())
    }
    spark.stop()
  }
}
