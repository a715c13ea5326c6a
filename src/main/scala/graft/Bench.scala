package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Per-round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
 * and the core validation-throughput probe, printing ONE JSON line.
 * Each query gets one warm-up execution (JIT + codegen cache) before the
 * timed run, so numbers reflect steady state rather than JVM start-up.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm-up: one full pass (discard)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val s = try timeIt(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      System.err.println(f"[bench] warmup $name: $s%.2f s")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try timeIt(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      System.err.println(f"[bench] timed  $name: $sec%.2f s")
      name -> sec
    }

    // constraint-eval throughput probe: 2M interleaved docs, full violation
    // projection + summary aggregate (the north-rule metric at bench scale)
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_THROUGHPUT_DOCS", "2000000").toLong
    val plan = SparkEntry.docsPlan
    def validateAll(): Unit = {
      val docs = graft.io.Docs.generate(spark, nDocs, numPartitions = cpus.toInt * 4,
        corruptEvery = 1000)
      graft.exec.ValidationRunner
        .summary(graft.exec.ValidationRunner.validateCounts(docs, plan), Seq.empty)
        .collect()
    }
    validateAll() // warm-up
    val tpSec = timeIt(validateAll())
    val docsPerSec = nDocs / tpSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","validate_docs":$nDocs,"validate_sec":$tpSec,"validate_docs_per_sec":$docsPerSec,"cpus":$cpus}""")
    spark.stop()
  }
}
