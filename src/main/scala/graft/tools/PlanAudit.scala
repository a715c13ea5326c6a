package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Physical-plan audit for the driver queries: prints `explain("formatted")`
 * for each, so scan pushdown (PushedFilters / ReadSchema), join strategy
 * (broadcast vs SMJ), and WholeStageCodegen spans can be reviewed. Pass
 * query names as args, or none for a default set.
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("v_violations", "v_refcheck", "q1_agg", "q_join_agg", "q_topk",
        "d_embed_neardup_lsh", "s_ann_topk", "v_unique_salted", "t_tokens")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
