package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-runs the driver contract exactly as the driver does:
  * `SparkEntry.entry` on sf0.001 must return >0 rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(25, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
