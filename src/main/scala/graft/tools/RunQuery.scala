package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner: `runMain graft.tools.RunQuery q1_agg ...`
  * (sf dir from SPARK_GRAFT_SF_DIR, default sf0.001). */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("dbg-r5")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.show(10, false)
      println(f"[dbg] $q took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
