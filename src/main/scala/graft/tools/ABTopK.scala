package graft.tools

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** In-JVM A/B of the flat-array TopK buffer vs the old kryo-HashMap buffer
  * (same window, alternating trials — the only trustworthy comparison on
  * this host). Also cross-checks both kept sets are identical. */
object ABTopK {
  /** The pre-round-6 aggregator, verbatim (kryo HashMap buffer). */
  class OldTopKAggregator(k: Int)
      extends Aggregator[graft.ops.Ann.Scored, mutable.HashMap[Long, Double], Seq[graft.ops.Ann.Scored]] {
    private def beats(s: Double, id: Long, ws: Double, wid: Long): Boolean =
      s > ws || (s == ws && id < wid)
    private def add(h: mutable.HashMap[Long, Double], id: Long, s: Double) = {
      if (!h.contains(id)) {
        if (h.size < k) h.update(id, s)
        else {
          var wid = 0L; var ws = 0.0; var first = true
          h.foreach { case (hid, hs) =>
            if (first || hs < ws || (hs == ws && hid > wid)) { ws = hs; wid = hid; first = false }
          }
          if (beats(s, id, ws, wid)) { h.remove(wid); h.update(id, s) }
        }
      }
      h
    }
    override def zero = mutable.HashMap.empty[Long, Double]
    override def reduce(h: mutable.HashMap[Long, Double], a: graft.ops.Ann.Scored) = add(h, a.id, a.score)
    override def merge(h1: mutable.HashMap[Long, Double], h2: mutable.HashMap[Long, Double]) = {
      h2.foreach { case (id, s) => add(h1, id, s) }; h1
    }
    override def finish(h: mutable.HashMap[Long, Double]): Seq[graft.ops.Ann.Scored] =
      h.iterator.map { case (id, s) => graft.ops.Ann.Scored(s, id) }.toSeq
        .sortBy(s => (-s.score, s.id))
    override def bufferEncoder: Encoder[mutable.HashMap[Long, Double]] =
      Encoders.kryo[mutable.HashMap[Long, Double]]
    override def outputEncoder: Encoder[Seq[graft.ops.Ann.Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[graft.ops.Ann.Scored]]()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = docs.where(col("vec_id") < 5)
    val d = docs.select(col("vec_id").cast("long").as("doc_id"), col("embedding").as("dv"))
    val q = queries.select(col("vec_id").cast("long").as("query_id"), col("embedding").as("qv"))
    val scored = d.join(broadcast(q)).where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.Vectors.cosine(col("dv"), col("qv")).as("score"))
    def run(old: Boolean): org.apache.spark.sql.DataFrame = {
      val topk =
        if (old) udaf(new OldTopKAggregator(3), Encoders.product[graft.ops.Ann.Scored])
        else udaf(new graft.ops.Ann.TopKAggregator(3), Encoders.product[graft.ops.Ann.Scored])
      scored.where(col("score").isNotNull).groupBy(col("query_id"))
        .agg(topk(col("score"), col("doc_id")).as("nn"))
        .select(col("query_id"), posexplode(col("nn")))
        .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("neighbor_id"))
    }
    // identical kept sets
    val a = run(true).collect().map(_.toString).sorted
    val b = run(false).collect().map(_.toString).sorted
    require(a.sameElements(b), "kept sets differ between old and new aggregator!")
    def timeIt(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val olds = mutable.ArrayBuffer[Double](); val news = mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 6) { olds += timeIt(run(true).count()); news += timeIt(run(false).count()) }
    println(f"[abtopk] old kryo-map: min=${olds.min}%.3f  trials=${olds.map(x => f"$x%.3f").mkString(",")}")
    println(f"[abtopk] new flatbuf:  min=${news.min}%.3f  trials=${news.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
