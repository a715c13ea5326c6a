package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions
import graft.ops.Dedup

/** Piecewise timing of the minhash near-dup DAG stages (one JVM, alternating). */
object ABMinhashParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus: DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.select(col("doc_id"), col("text"))
        .union(docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    }
    def withSh = corpus.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("sh")).where(size(col("sh")) > 0)
    def withSig = withSh.select(col("id"),
      HashExpressions.minhashSignatureNative(col("sh"), 32).as("sig"))
    def banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(7)), b =>
        xxhash64(b, to_json(struct(slice(col("sig"), b * 4 + 1, lit(4))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    def pairs = {
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      a.join(b, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    }

    def time(label: String, f: () => Long): Unit = {
      f() // warm
      val ts = (1 to 3).map { _ =>
        val t = System.nanoTime(); f(); (System.nanoTime() - t) / 1e9
      }
      println(f"$label%-12s min=${ts.min}%.2f s trials=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    time("scan", () => corpus.count())
    time("shingles", () => withSh.select(sum(size(col("sh")))).collect()(0).getLong(0))
    time("sig", () => withSig.select(sum(size(col("sig")))).collect()(0).getLong(0))
    time("banded", () => banded.count())
    time("pairs", () => pairs.count())
    spark.stop()
  }
}
