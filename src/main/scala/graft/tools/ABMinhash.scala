package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.HashExpressions
import graft.ops.Dedup

/**
 * In-JVM A/B for the minhashNearDups cache/lifecycle variants (alternating
 * trials — the only valid protocol on this noisy host):
 *   A: persist sig + eager localCheckpoint result + unpersist
 *   B: no persist at all (native sig recomputed per consumer)
 *   C: persist sig, lazy result, count, unpersist after (round-1 shape)
 */
object ABMinhash {
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

    def build(df: DataFrame, persistSig: Boolean): (DataFrame, Option[DataFrame]) = {
      val numHashes = 32; val bands = 8; val rowsPerBand = 4
      val withSh = df.select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("sh")).where(size(col("sh")) > 0)
      val sig0 = withSh.select(col("id"),
        HashExpressions.minhashSignatureNative(col("sh"), numHashes).as("sig"))
      val withSig = if (persistSig) sig0.persist(StorageLevel.MEMORY_AND_DISK) else sig0
      val banded = withSig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(b, to_json(struct(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val pairs = a.join(b, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      val verified = pairs
        .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .withColumn("sig_sim",
          aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
            lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes))
        .where(col("sig_sim") >= 0.9)
        .select("id_a", "id_b", "sig_sim")
      (verified, if (persistSig) Some(withSig) else None)
    }

    def variantA(): Long = {
      val (v, sig) = build(corpus, persistSig = true)
      val out = v.localCheckpoint(true)
      sig.foreach(_.unpersist())
      val n = out.count(); out.unpersist(); n
    }
    def variantB(): Long = build(corpus, persistSig = false)._1.count()
    def variantC(): Long = {
      val (v, sig) = build(corpus, persistSig = true)
      val n = v.count()
      sig.foreach(_.unpersist())
      n
    }

    def time(f: () => Long): (Double, Long) = {
      val t = System.nanoTime(); val n = f(); ((System.nanoTime() - t) / 1e9, n)
    }
    // warm-up
    variantA(); variantB(); variantC()
    val rs = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[Double]](
      "A_ckpt" -> scala.collection.mutable.ArrayBuffer(),
      "B_noPersist" -> scala.collection.mutable.ArrayBuffer(),
      "C_lazyPersist" -> scala.collection.mutable.ArrayBuffer())
    for (_ <- 1 to 3) {
      val (ta, na) = time(variantA _); rs("A_ckpt") += ta
      val (tb, nb) = time(variantB _); rs("B_noPersist") += tb
      val (tc, nc) = time(variantC _); rs("C_lazyPersist") += tc
      assert(na == nb && nb == nc, s"row counts differ: $na $nb $nc")
    }
    rs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%-14s min=${v.min}%.2f s trials=${v.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
