package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: minhash LSH bucket-size distribution at sf0.1. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val withDups = docs.select(col("doc_id"), col("text"))
      .union(docs.where(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val sig = graft.ops.Dedup.minhashSignature(col("text"), 32, 3)
    val banded = withDups.select(col("doc_id").as("id"), sig.as("sig"))
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(7)), b =>
        xxhash64(b, to_json(struct(slice(col("sig"), b * 4 + 1, lit(4))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val t0 = System.nanoTime()
    val sizes = banded.groupBy("band", "bucket").count()
      .agg(count(lit(1)).as("buckets"), max("count").as("max_sz"),
        sum(col("count") * col("count")).as("sum_sq")).collect()(0)
    println(f"[probe] sig+bucket time: ${(System.nanoTime()-t0)/1e9}%.1f s; " +
      s"buckets=${sizes.getLong(0)} max_bucket=${sizes.getLong(1)} candidate_pairs~=${sizes.getLong(2)}")
    spark.stop()
  }
}
