package graft.tools

import graft.SparkEntry

/** Prints formatted physical plans for selected queries so plan
  * properties (PushedFilters, ReadSchema pruning, broadcast joins,
  * WholeStageCodegen spans) can be inspected and asserted by eye.
  * Not part of the driver contract.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_group_max_having", "q3_proj_filter",
        "q5_join_agg", "q6_latest_per_key")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
