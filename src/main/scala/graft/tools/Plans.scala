package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dumps `explain("formatted")` for every SparkEntry query — the plan-review
 * loop: verify pushed filters (`PushedFilters`), pruned scans (`ReadSchema`),
 * broadcast joins on dims, and whole-stage codegen coverage.
 *
 * Usage: runMain graft.tools.Plans [sfDir] [outFile]
 */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n===================== $name =====================\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
