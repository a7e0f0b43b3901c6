package graft.tools

/** Scratch variance probe (not part of the driver contract): run one
  * SparkEntry query N times in a single JVM and print per-run seconds,
  * isolating a query's run-to-run spread from the rest of the bench
  * (cross-query cache/heap pressure). Usage:
  * runMain graft.tools.RepeatQuery <queryName> [runs=4]
  */
object RepeatQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Session.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = graft.SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[repeat] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
