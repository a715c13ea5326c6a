package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugCodegen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val docs = graft.io.Docs.generate(spark, 1000, 4, corruptEvery = 100)
    val counted = graft.exec.ValidationRunner.validateCounts(docs, graft.SparkEntry.docsPlan)
    // debugCodegen output
    import org.apache.spark.sql.execution.debug._
    counted.debugCodegen()
    spark.stop()
  }
}
