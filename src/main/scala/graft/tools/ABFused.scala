package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: fused MinHashFromTokens vs the two-step
  * MinHashSignature(ShingleHashes(tokens)) signature leg, in-JVM
  * alternating over the DedupCorpus (signature computation only — one
  * aggregate consumer, no shuffle; result-sum equality asserted). */
object ABFused {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = DedupCorpus.ensure(spark, nDocs)
    def docs = spark.read.parquet(path)
    def sumOf(sig: org.apache.spark.sql.Column): Long =
      docs.select(sig.as("sig"))
        .select(aggregate(col("sig"), lit(0L), (a, x) => a + coalesce(x, lit(0)).cast("long")).as("s"))
        .agg(sum("s")).collect()(0).getLong(0)
    def fused = graft.ops.Dedup.minhashSignature(col("text"), 32, 3)
    def twostep = graft.functions.HashExpressions.minhashSignatureNative(
      graft.ops.Dedup.shingleHashes(col("text"), 3), 32)
    def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    val sf = sumOf(fused); val st = sumOf(twostep) // warm-up + equality
    require(sf == st, s"fused ($sf) != twostep ($st)")
    val (tf, tt) = (
      scala.collection.mutable.ArrayBuffer[Double](),
      scala.collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to 3) { tf += time(sumOf(fused)); tt += time(sumOf(twostep)) }
    println(f"[abfused] fused   min=${tf.min}%.2f s (${nDocs / tf.min}%.0f docs/s) trials=${tf.map(x => f"$x%.1f").mkString(",")}")
    println(f"[abfused] twostep min=${tt.min}%.2f s (${nDocs / tt.min}%.0f docs/s) trials=${tt.map(x => f"$x%.1f").mkString(",")}")
    println(f"[abfused] speedup=${tt.min / tf.min}%.2fx (signature sums equal: $sf)")
    spark.stop()
  }
}
