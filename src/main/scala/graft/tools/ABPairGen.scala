package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.HashExpressions
import graft.ops.Dedup

/**
 * In-JVM alternating A/B: round-3 join-shaped near-dup pipelines (bucketed
 * self-join + cap aggregate-join + signature re-joins over a persisted sig
 * table) vs the round-4 one-shuffle groupBy + verified-pair-generator
 * pipelines, on the SAME materialized DedupCorpus with the Probe
 * parameterization. Also asserts identical pair counts.
 *
 * Args: [nDocs] [trials]. The old shapes are inlined here verbatim (modulo
 * the removed localCheckpoint lifecycle) so the comparison survives the
 * library moving on.
 */
object ABPairGen {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val trials = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = DedupCorpus.ensure(spark, n)
    def docs: DataFrame = spark.read.parquet(path)

    import DedupCorpus.Probe._

    // ---- round-3 minhash shape (self-join + verify re-joins + persist) ----
    def minhashOld(df: DataFrame): DataFrame = {
      val rowsPerBand = NumHashes / Bands
      val withSh = df.select(col("doc_id").as("id"),
          Dedup.shingleHashes(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      val withSig = withSh.select(col("id"),
          HashExpressions.minhashSignatureNative(col("sh"), NumHashes).as("sig"))
        .coalesce(df.sparkSession.sparkContext.defaultParallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandKeys = (0 until Bands).map { b =>
        xxhash64(lit(b) +: (0 until rowsPerBand)
          .map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }
      val banded0 = withSig.select(col("id"), posexplode(array(bandKeys: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val banded = Dedup.capBuckets(banded0, Seq("band", "bucket"), MaxBucket)
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val pairs = a.join(b, Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      val verified = pairs
        .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .withColumn("sig_sim",
          aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast(IntegerType)),
            lit(0), (acc, v) => acc + v).cast(DoubleType) / lit(NumHashes))
        .where(col("sig_sim") >= Threshold)
        .select("id_a", "id_b", "sig_sim")
      val out = verified.localCheckpoint(true)
      withSig.unpersist()
      out
    }

    // ---- round-3 simhash shape (self-join carrying sig + cap agg-join) ----
    def simhashOld(df: DataFrame): DataFrame = {
      val d = 3
      val k = SimhashBlocks
      val combos = (0 until k).combinations(k - d).toSeq
      val bounds = (0 to k).map(i => i * 64 / k)
      def blockVal(sig: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column = {
        val sh = bounds(i)
        val width = bounds(i + 1) - sh
        val extracted = call_function("shiftrightunsigned", sig, lit(sh))
        if (sh + width >= 64) extracted
        else extracted.bitwiseAND(lit((1L << width) - 1))
      }
      val withSig = df.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("sig"))
      val keys = combos.zipWithIndex.map { case (combo, ci) =>
        xxhash64((lit(ci.toLong) +: combo.map(i => blockVal(col("sig"), i))): _*)
      }
      val blocked0 = withSig.select(col("id"), col("sig"), posexplode(array(keys: _*)))
        .withColumnRenamed("pos", "blk").withColumnRenamed("col", "bval")
      val blocked = Dedup.capBuckets(blocked0, Seq("blk", "bval"), MaxBucket)
      val a = blocked.select(col("blk"), col("bval"), col("id").as("id_a"), col("sig").as("sig_a"))
      val b = blocked.select(col("blk"), col("bval"), col("id").as("id_b"), col("sig").as("sig_b"))
      a.join(b, Seq("blk", "bval"))
        .where(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("hamming", graft.functions.Vectors.hamming64(col("sig_a"), col("sig_b")))
        .where(col("hamming") <= d)
        .select("id_a", "id_b", "hamming")
    }

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f; ((System.nanoTime() - t0) / 1e9, c)
    }

    // warm-up + count equality check
    val mOldN = minhashOld(docs).count()
    val mNewN = minhash(docs).count()
    val sOldN = simhashOld(docs).count()
    val sNewN = simhash(docs).count()
    require(mOldN == mNewN, s"minhash pair counts differ: old=$mOldN new=$mNewN")
    require(sOldN == sNewN, s"simhash pair counts differ: old=$sOldN new=$sNewN")
    println(s"[abpairgen] n=$n minhash pairs=$mNewN simhash pairs=$sNewN (old==new)")

    for (tr <- 1 to trials) {
      val (a1, _) = t(minhashOld(docs).count())
      val (b1, _) = t(minhash(docs).count())
      val (a2, _) = t(simhashOld(docs).count())
      val (b2, _) = t(simhash(docs).count())
      println(f"[abpairgen] trial $tr: minhash old=$a1%.2f new=$b1%.2f (${a1 / b1}%.2fx) | " +
        f"simhash old=$a2%.2f new=$b2%.2f (${a2 / b2}%.2fx)")
    }
    spark.stop()
  }
}
