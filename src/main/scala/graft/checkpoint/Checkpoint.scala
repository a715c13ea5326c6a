package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Partition-lineage checkpointing: a killed validation run resumes from the
 * last committed partition without recomputation (north rule; the
 * reference's seed is `.piq` stream appendability — "no headers or
 * footers... append", `doc/piq.md:697-700`).
 *
 * Layout under `root/`:
 *   violations/ bucket=N/...   per-bucket violation rows (parquet)
 *   summary/    bucket=N/...   per-bucket pass/fail metrics
 *   lineage/                   one row per COMMITTED bucket (append-only)
 *
 * Exactly-once per bucket: bucket outputs are written with dynamic
 * partition overwrite (idempotent on re-run), and the lineage row is
 * appended only AFTER the bucket's data lands — a crash between the two
 * re-processes that bucket (overwriting identical output), never skips or
 * duplicates. This is the parquet-filesystem equivalent of the Iceberg
 * snapshot+lineage single-transaction design in SURVEY.md §2.D (no Iceberg
 * runtime jars ship in this sandbox — documented deviation; swap the two
 * writes for one Iceberg transaction when running against a real catalog).
 */
final class CheckpointManager(root: String) extends Serializable {
  private def lineagePath = s"$root/lineage"
  private def violationsPath = s"$root/violations"
  private def summaryPath = s"$root/summary"

  def committedBuckets(spark: SparkSession): Set[Int] = {
    try {
      spark.read.parquet(lineagePath).select("bucket").collect().map(_.getInt(0)).toSet
    } catch {
      case _: Exception => Set.empty // no lineage yet
    }
  }

  /**
   * Run `process` over every not-yet-committed bucket of `df`.
   *
   * @param df        input with an integral `bucketCol` (e.g.
   *                  `pmod(xxhash64(doc_id), nBuckets)`)
   * @param bucketCol bucket column name
   * @param batches   buckets are committed in groups of this many (fewer
   *                  jobs at scale; 1 = finest-grained resume)
   * @param process   bucket-batch DataFrame → (violations, summary); both
   *                  must retain bucketCol
   */
  def runResumable(df: DataFrame, bucketCol: String, allBuckets: Seq[Int],
      process: DataFrame => (DataFrame, DataFrame), batches: Int = 1): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val done = committedBuckets(spark)
    val todo = allBuckets.filterNot(done)
    todo.grouped(math.max(1, batches)).foreach { group =>
      val batch = df.where(col(bucketCol).isin(group.map(Integer.valueOf): _*))
      val (violations, summary) = process(batch)
      violations.withColumn("bucket", col(bucketCol).cast("int"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(violationsPath)
      summary.withColumn("bucket", col(bucketCol).cast("int"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(summaryPath)
      // commit marker LAST: crash before this line → bucket re-runs idempotently
      import spark.implicits._
      group.map(b => (b, System.currentTimeMillis()))
        .toDF("bucket", "committed_at_ms")
        .write.mode(SaveMode.Append).parquet(lineagePath)
    }
  }

  def violations(spark: SparkSession): DataFrame = spark.read.parquet(violationsPath)
  def summary(spark: SparkSession): DataFrame = spark.read.parquet(summaryPath)
}
