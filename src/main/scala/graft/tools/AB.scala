package graft.tools

import org.apache.spark.sql.SparkSession
import graft.exec.ValidationRunner
import graft.io.Docs

/** In-JVM A/B: detail-array summary vs count-only summary, alternating trials. */
object AB {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 4000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.SparkEntry.docsPlan
    def docs = Docs.generate(spark, nDocs, numPartitions = 256, corruptEvery = 1000)
    def detail(): Unit =
      ValidationRunner.summary(ValidationRunner.validate(docs, plan), Seq.empty).collect()
    def counts(): Unit =
      ValidationRunner.summary(ValidationRunner.validateCounts(docs, plan), Seq.empty).collect()
    def gen(): Unit = { docs.agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1))).collect() } // generation-only baseline
    def time(f: () => Unit): Double = { val t = System.nanoTime(); f(); (System.nanoTime() - t) / 1e9 }
    // warm-up all three
    detail(); counts(); gen()
    val (d, c, g) = (
      scala.collection.mutable.ArrayBuffer[Double](),
      scala.collection.mutable.ArrayBuffer[Double](),
      scala.collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to 3) { d += time(detail _); c += time(counts _); g += time(gen _) }
    println(f"detail min=${d.min}%.2f s (${nDocs / d.min}%.0f docs/s) trials=${d.map(x => f"$x%.1f").mkString(",")}")
    println(f"counts min=${c.min}%.2f s (${nDocs / c.min}%.0f docs/s) trials=${c.map(x => f"$x%.1f").mkString(",")}")
    println(f"genonly min=${g.min}%.2f s (${nDocs / g.min}%.0f docs/s) trials=${g.map(x => f"$x%.1f").mkString(",")}")
    spark.stop()
  }
}
