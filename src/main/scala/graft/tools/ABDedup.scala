package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-operator width A/B for the dedup plane: times minhash and simhash
  * separately at 8-wide and full-width, alternated in ONE JVM (host-window
  * immune for relative numbers). Args: [nDocs] [trials]. */
object ABDedup {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val trials = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = DedupCorpus.ensure(spark, n)

    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def docs(width: Int) = {
      spark.conf.set("spark.sql.shuffle.partitions", if (width > 0) width.toString else cpus)
      val b = spark.read.parquet(path)
      if (width > 0) b.coalesce(width) else b
    }
    def mh(width: Int): Unit = DedupCorpus.Probe.minhash(docs(width)).count()
    def sh(width: Int, k: Int): Unit = graft.ops.Dedup.simhashNearDups(docs(width),
      "doc_id", "text", maxHamming = 3, maxBucket = DedupCorpus.Probe.MaxBucket,
      numBlocks = k).count() // k varies by design here (the A/B dimension)

    mh(8); mh(0); sh(8, 4); sh(0, 4); sh(8, 6); sh(0, 6) // warm-up
    for (tr <- 1 to trials) {
      val m8 = t(mh(8)); val mF = t(mh(0))
      val s48 = t(sh(8, 4)); val s4F = t(sh(0, 4))
      val s68 = t(sh(8, 6)); val s6F = t(sh(0, 6))
      println(f"[abdedup] trial $tr: minhash 8w=$m8%.2f full=$mF%.2f eff=${m8 / mF / (cpus.toInt / 8.0)}%.2f | " +
        f"simhash k4 8w=$s48%.2f full=$s4F%.2f eff=${s48 / s4F / (cpus.toInt / 8.0)}%.2f | " +
        f"simhash k6 8w=$s68%.2f full=$s6F%.2f eff=${s68 / s6F / (cpus.toInt / 8.0)}%.2f")
    }
    spark.stop()
  }
}
