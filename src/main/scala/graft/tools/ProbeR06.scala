package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase-timing probe: splits the heavy queries into phases and
  * reports per-phase wall time + job counts under the frozen Bench session
  * config. Measurement-only tooling. */
object ProbeR06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet(): Unit
    })
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(50); jobs.set(0)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(50)
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  jobs=${jobs.get}")
      r
    }
    val mode = if (args.nonEmpty) args(0) else "pq"
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")

    (1 to 3).foreach { round =>
      System.err.println(s"--- round $round ($mode) ---")
      mode match {
        case "pq" =>
          val docs = t("embeddings")
          val queries = docs.where(col("vec_id") < 20)
          val model = phase("train")(graft.ops.Pq.train(docs, "vec_id", "embedding", m = 8, iters = 10))
          val pq = graft.ops.Pq.topK(docs, queries, "vec_id", "embedding",
            "vec_id", "embedding", k = 5, model, rerank = 25).select("query_id", "neighbor_id")
          phase("pq_topk_count")(pq.count())
          val brute = graft.ops.Ann.bruteTopK(docs, queries, "vec_id", "embedding",
            "vec_id", "embedding", k = 5).select("query_id", "neighbor_id")
          phase("brute_count")(brute.count())
          phase("recall_join")(brute.join(pq.withColumn("_h", lit(1)),
            Seq("query_id", "neighbor_id"), "left").agg(count(col("_h")), count(lit(1))).collect())
        case "ivf" =>
          val docs = t("embeddings")
          val queries = docs.where(col("vec_id") < 20)
          val n = phase("count")(docs.count())
          val nCells = math.max(4, math.round(math.sqrt(n.toDouble)).toInt)
          val nProbe = math.max(8, (nCells * 3 + 3) / 4)
          val cents = phase("train")(graft.ops.Ann.trainCentroids(docs, "vec_id", "embedding",
            nCells = nCells, sampleN = math.max(nCells * 40, 2000), iters = 10))
          val ivf = graft.ops.Ann.ivfTopK(docs, queries, "vec_id", "embedding",
            "vec_id", "embedding", k = 5, centroids = cents, nProbe = nProbe)
            .select("query_id", "neighbor_id")
          phase("ivf_count")(ivf.count())
          val brute = graft.ops.Ann.bruteTopK(docs, queries, "vec_id", "embedding",
            "vec_id", "embedding", k = 5).select("query_id", "neighbor_id")
          phase("brute_count")(brute.count())
        case "star" | "lp" =>
          val docs = t("documents")
          val withDups = docs.select(col("doc_id"), col("text"))
            .union(docs.where(col("doc_id") < 50)
              .select((col("doc_id") + 100000).as("doc_id"), col("text")))
            .where(col("doc_id") < 1000 || col("doc_id") >= 100000)
          val cands = graft.ops.Dedup.minhashNearDups(withDups, "doc_id", "text",
            numHashes = 32, bands = 8, shingleSize = 1, threshold = 1.0)
          val toks = withDups.select(col("doc_id"),
            array_sort(array_distinct(graft.functions.Text.tokens(col("text")))).as("tk"))
          val verified = cands
            .join(toks.select(col("doc_id").as("id_a"), col("tk").as("tk_a")), "id_a")
            .join(toks.select(col("doc_id").as("id_b"), col("tk").as("tk_b")), "id_b")
            .where(col("tk_a") === col("tk_b"))
            .select("id_a", "id_b")
          phase("verified_count")(verified.count())
          val labels = phase("cc")(
            if (mode == "star") graft.ops.Dedup.connectedComponentsStar(verified)
            else graft.ops.Dedup.connectedComponents(verified))
          phase("label_count")(labels.orderBy("id").count())
        case "vstats" =>
          phase("columnStats")(graft.exec.ValidationRunner.columnStats(t("documents"),
            Seq("doc_id", "text", "lang", "source", "n_chars"), exactDistinct = true)
            .orderBy("column").count())
        case "media" =>
          for (p <- Seq(8, 16, 32)) {
            phase(s"media_p$p") {
              val media = graft.ops.Multimodal.synthesizeMedia(spark, 2000, numPartitions = p)
              graft.ops.Multimodal.extractFeatures(media).toDF()
                .groupBy(col("mime"), col("ok").cast("long").as("ok"))
                .agg(count(lit(1)).as("n"), sum(col("feat_dim")).as("dims"))
                .count()
            }
          }
        case "simhash" =>
          val docs = t("documents")
          val withDups = docs.select(col("doc_id"), col("text"))
            .union(docs.where(col("doc_id") < 50)
              .select((col("doc_id") + 100000).as("doc_id"), col("text")))
          val cands = phase("simhash_pairs")({
            val c = graft.ops.Dedup.simhashNearDups(withDups, "doc_id", "text", maxHamming = 3)
            c.count(); c
          })
          val toks = withDups.select(col("doc_id"),
            array_sort(graft.functions.Text.tokens(col("text"))).as("tk"))
          phase("verify_join")(cands
            .join(toks.select(col("doc_id").as("id_a"), col("tk").as("tk_a")), "id_a")
            .join(toks.select(col("doc_id").as("id_b"), col("tk").as("tk_b")), "id_b")
            .where(col("tk_a") === col("tk_b"))
            .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
            .count())
      }
    }
    spark.stop()
  }
}
