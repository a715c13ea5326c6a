package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Width A/B of the minhash pipeline's PIECES, alternated in one JVM:
  *   sig    — scan + tokenize + shingle + signature, reduced to one agg
  *            (no wide shuffle): the pure compute leg
  *   full   — the whole near-dup probe job (adds explode + bucket shuffle
  *            + collect_list + pair generator + pair dedup)
  * Attributes the scaling gap to compute vs shuffle. Args: [nDocs] [trials].
  */
object ABStage {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val trials = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "128"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = DedupCorpus.ensure(spark, n)

    def docs(width: Int) = {
      spark.conf.set("spark.sql.shuffle.partitions", if (width > 0) width.toString else cpus)
      val b = spark.read.parquet(path)
      if (width > 0) b.coalesce(width) else b
    }
    def sigOnly(width: Int): Unit = {
      val d = docs(width)
      d.select(graft.functions.HashExpressions.minhashSignatureNative(
          graft.ops.Dedup.shingleHashes(col("text"), 3), DedupCorpus.Probe.NumHashes).as("sig"))
        .select(element_at(col("sig"), 1).as("s1"))
        .agg(sum("s1")).collect()
    }
    def full(width: Int): Unit = DedupCorpus.Probe.minhash(docs(width)).count()

    // minhash probe job re-shaped over groupByKey.flatMapGroups (Long ids)
    def fmg(width: Int): Unit = {
      import DedupCorpus.Probe._
      val sp = spark
      import sp.implicits._
      val rowsPerBand = NumHashes / Bands
      val d = docs(width)
      val withSig = d.select(col("doc_id").as("id"),
          graft.functions.HashExpressions.minhashSignatureNative(
            graft.ops.Dedup.shingleHashes(col("text"), 3), NumHashes).as("sig"))
        .where(size(col("sig")) > 0)
      val bandKeys = (0 until Bands).map { b =>
        xxhash64(lit(b) +: (0 until rowsPerBand)
          .map(rr => element_at(col("sig"), b * rowsPerBand + rr + 1)): _*)
      }
      val banded = withSig.select(col("id"), col("sig"),
          explode(array(bandKeys: _*)).as("bucket"))
        .as[(Long, Array[Int], Long)]
      val cap = MaxBucket
      val thr = Threshold
      val nh = NumHashes
      val pairs = banded.groupByKey(_._3).flatMapGroups { (_, it) =>
        val ids = new scala.collection.mutable.ArrayBuffer[Long]()
        val sigs = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
        var over = false
        while (it.hasNext && !over) {
          val r = it.next()
          ids += r._1; sigs += r._2
          if (ids.length > cap) over = true
        }
        if (over || ids.length < 2) Iterator.empty
        else {
          val m = ids.length
          (0 until m - 1).iterator.flatMap { i =>
            (i + 1 until m).iterator.flatMap { j =>
              val a = sigs(i); val b = sigs(j)
              var eq = 0; var k = 0
              while (k < nh) { if (a(k) == b(k)) eq += 1; k += 1 }
              val sim = eq.toDouble / nh
              if (sim >= thr) {
                val (x, y) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
                Iterator.single((x, y, sim))
              } else Iterator.empty
            }
          }
        }
      }.toDF("id_a", "id_b", "sig_sim").dropDuplicates("id_a", "id_b")
      pairs.count(): Unit
    }

    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def oha(v: String): Unit =
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
    sigOnly(8); sigOnly(0); full(8); full(0) // warm-up
    for (tr <- 1 to trials) {
      val s8 = t(sigOnly(8)); val sF = t(sigOnly(0))
      val f8 = t(full(8)); val fF = t(full(0))
      val r = cpus.toInt / 8.0
      println(f"[abstage] trial $tr: sig 8w=$s8%.2f full=$sF%.2f eff=${s8 / sF / r}%.2f | " +
        f"job 8w=$f8%.2f full=$fF%.2f eff=${f8 / fF / r}%.2f | " +
        f"shuffle-leg 8w=${f8 - s8}%.2f full=${fF - sF}%.2f eff=${(f8 - s8) / (fF - sF) / r}%.2f")
      // in-JVM A/B of the collect_list sort-based-fallback threshold at full width
      oha("128"); val loF = t(full(0))
      oha("100000000"); val hiF = t(full(0))
      oha("128")
      println(f"[abstage]   oha full-width: sortfallback=$loF%.2f hashmap=$hiF%.2f")
      // wide (carrySig) vs narrow (id-only banding + verify re-joins), both widths
      def narrow(width: Int): Unit = graft.ops.Dedup.minhashNearDups(docs(width),
        "doc_id", "text", numHashes = DedupCorpus.Probe.NumHashes,
        bands = DedupCorpus.Probe.Bands, threshold = DedupCorpus.Probe.Threshold,
        maxBucket = DedupCorpus.Probe.MaxBucket, carrySig = false).count()
      val n8 = t(narrow(8)); val nF = t(narrow(0))
      println(f"[abstage]   narrow: 8w=$n8%.2f full=$nF%.2f eff=${n8 / nF / r}%.2f " +
        f"(wide full=$fF%.2f)")
      // flatMapGroups shape: same shuffle bytes but NO map-side sort (the
      // agg fallback sorts by key on BOTH sides; groupByKey sorts reduce-only)
      val g8 = t(fmg(8)); val gF = t(fmg(0))
      println(f"[abstage]   fmg:    8w=$g8%.2f full=$gF%.2f eff=${g8 / gF / r}%.2f")
    }
    spark.stop()
  }
}
