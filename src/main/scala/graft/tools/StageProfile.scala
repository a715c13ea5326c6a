package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level timing for one minhash run: prints (stage, tasks, wall ms,
  * total task ms, name) — attributes where a width-insensitive job spends
  * its time. Args: [nDocs] [width]. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = DedupCorpus.ensure(spark, n)
    def run(): Unit = DedupCorpus.Probe.minhash(spark.read.parquet(path)).count()
    run() // warm-up
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall}%6d ms " +
          f"taskTime=${m.executorRunTime}%7d ms cpu=${m.executorCpuTime / 1000000}%7d ms " +
          f"gc=${m.jvmGCTime}%6d ms deser=${m.executorDeserializeTime}%5d ms " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}%5d MB " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1048576}%5d MB " +
          f"in=${m.inputMetrics.bytesRead / 1048576}%5d MB  ${si.name.takeWhile(_ != '\n').take(40)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    println(f"[stage] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
