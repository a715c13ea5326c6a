package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** A/B: native codegen dot vs HOF dot over a large pair set. */
object ABVec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val q = e.where(col("vec_id") < 64).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def run(native: Boolean): Long = {
      val dot = if (native) Vectors.dot _ else Vectors.dotHof _
      e.join(broadcast(q))
        .select(sum(dot(col("embedding"), col("qv"))).as("s"))
        .collect(); 1L
    }
    def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    run(true); run(false) // warm-up both
    val tn = (1 to 3).map(_ => time(run(true))).min
    val th = (1 to 3).map(_ => time(run(false))).min
    val pairs = e.count() * 64
    println(f"[abvec] pairs=$pairs native=$tn%.2f s (${pairs / tn / 1e6}%.1f M dots/s) hof=$th%.2f s (${pairs / th / 1e6}%.1f M dots/s) speedup=${th / tn}%.2fx")
    spark.stop()
  }
}
