package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.exec.ValidationRunner
import graft.io.Docs

/** A/B: native StructArrayRuleCount count path vs plan check. */
object ABNative {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 4000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.SparkEntry.docsPlan
    def docs = Docs.generate(spark, nDocs, numPartitions = 256, corruptEvery = 1000)
    val counted = ValidationRunner.validateCounts(docs, plan)
    val physical = counted.queryExecution.executedPlan.toString
    println("[abnative] plan uses native: " + physical.toLowerCase.contains("structarrayrulecount"))
    val genericCounted = docs.withColumn("violation_count", plan.violationCountGeneric)
      .withColumn("valid", col("violation_count") === 0)
    def run(df: => org.apache.spark.sql.DataFrame): Unit =
      ValidationRunner.summary(df, Seq.empty).collect()
    def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    run(counted); run(genericCounted) // warm-up
    val (tn, tg) = (
      scala.collection.mutable.ArrayBuffer[Double](),
      scala.collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to 3) { tn += time(run(counted)); tg += time(run(genericCounted)) }
    println(f"[abnative] native  min=${tn.min}%.2f s (${nDocs / tn.min}%.0f docs/s) trials=${tn.map(x => f"$x%.1f").mkString(",")}")
    println(f"[abnative] generic min=${tg.min}%.2f s (${nDocs / tg.min}%.0f docs/s) trials=${tg.map(x => f"$x%.1f").mkString(",")}")
    println(f"[abnative] speedup=${tg.min / tn.min}%.2fx")
    spark.stop()
  }
}
