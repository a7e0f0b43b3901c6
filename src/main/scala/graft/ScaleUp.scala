package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Asymptotics-evidence corpus builder: writes a FACTOR× replica of a
  * testdata sf directory so the headline bench shapes can be measured
  * at two scales (BASELINE.md records the ratios).
  *
  * Fact tables replicate with key shifting so cardinalities and group
  * sizes scale while per-key structure is preserved:
  *  - events / lineitem / orders: ids shift by replica × stride —
  *    10× rows, 10× keys, same rows-per-key. For events BOTH
  *    event_id and user_id shift: user_id is the lakehouse record
  *    key (LakehouseQueries keyField), so leaving it fixed would
  *    grow rows-per-key 10× and collapse the post-upsert table —
  *    a different asymptote than the one being measured. user_id
  *    never joins a dimension (it is only a window/group key), so
  *    the shift changes no query shape.
  *  - documents: doc_id shifts AND every word is tagged with the
  *    replica id, so each replica is NEW content (disjoint shingle
  *    space). Replicas are not near-duplicates of each other — the
  *    realistic growth shape for a dedup corpus; the planted near-dup
  *    structure within each replica is preserved exactly.
  *  - embeddings: vec_id shifts; vectors get a small deterministic
  *    per-replica offset so replicas aren't exact duplicate points.
  * Dimension tables (region/nation/customer/supplier/part) copy
  * verbatim — at 100 TB dims grow far slower than facts, and keeping
  * them fixed preserves the broadcast-join shape the queries use.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> [factor=10]
  */
object ScaleUp {

  private val Stride = 1000000000L // > any base id at bench scales

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = Session.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String)(one: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val all = (0 until factor).map(k => one(base, k)).reduce(_ unionAll _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${base.count()} -> ${all.count()}")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: copied verbatim (dimension)")
    }

    replicate("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * Stride))
        .withColumn("user_id", col("user_id") + lit(k * Stride))
    }
    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * Stride))
    }
    replicate("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * Stride))
    }
    replicate("documents") { (df, k) =>
      val tagged =
        if (k == 0) df
        else df.withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(lit(s"r$k"), w)), " "))
      tagged.withColumn("doc_id", col("doc_id") + lit(k * Stride))
        .withColumn("n_chars", length(col("text")))
    }
    replicate("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * Stride))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(k * 1e-3f)))
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach(copy)
    spark.stop()
  }
}
