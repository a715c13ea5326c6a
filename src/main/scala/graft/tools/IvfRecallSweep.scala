package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfRecallSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("dbg-ivf")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = docs.count()
      val queries = docs.where(col("vec_id") < 20)
      val brute = graft.ops.Ann.bruteTopK(docs, queries, "vec_id", "embedding",
        "vec_id", "embedding", k = 5).select("query_id", "neighbor_id")
      val total = brute.count()
      for (nCells <- Seq(8, 16, math.max(4, math.round(math.sqrt(n.toDouble)).toInt));
           nProbe <- Seq(4, 8, 12, 16)) {
        if (nProbe <= nCells) {
          val cents = graft.ops.Ann.trainCentroids(docs, "vec_id", "embedding",
            nCells = nCells, sampleN = math.max(nCells * 40, 2000), iters = 10)
          val ivf = graft.ops.Ann.ivfTopK(docs, queries, "vec_id", "embedding",
            "vec_id", "embedding", k = 5, centroids = cents, nProbe = nProbe)
            .select("query_id", "neighbor_id")
          val matched = ivf.join(brute, Seq("query_id", "neighbor_id")).count()
          println(f"[ivf] $dir n=$n cells=$nCells probe=$nProbe recall=${matched.toDouble/total}%.3f")
        }
      }
    }
    spark.stop()
  }
}
