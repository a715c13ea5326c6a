package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.compile.ValidationPlan
import graft.exec.ValidationRunner

/**
 * Structured-Streaming validation — the continuous form of the reference's
 * pull-based document stream (`src/convert.ml:456-487`: read one object,
 * validate, emit, repeat). A Piq stream's "one document at a time with
 * per-object location reset" becomes a micro-batched `readStream` with the
 * SAME compiled violation projection as the batch path (one plan, two
 * runners), plus watermarked per-window pass/fail aggregation.
 */
object ValidateStream {

  /** File-based document stream (new parquet files under `path` are the stream). */
  def fromParquetDir(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The same narrow validate projection as the batch runner — stateless. */
  def validate(stream: DataFrame, plan: ValidationPlan): DataFrame =
    ValidationRunner.validate(stream, plan)

  /**
   * Windowed pass/fail counts with a watermark on `tsCol` — late documents
   * beyond the watermark are dropped from the aggregate (the batch analog of
   * a closed partition in the checkpoint lineage).
   */
  def windowedSummary(validated: DataFrame, tsCol: String,
      windowDuration: String = "1 minute", watermark: String = "2 minutes"): DataFrame =
    validated
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("valid").cast("long")).as("n_valid"),
        sum((!col("valid")).cast("long")).as("n_invalid"))

  /**
   * Streaming first-seen dedup: keeps the first document per `doc_id` across
   * micro-batches via keyed state (`KeyValueGroupedDataset.flatMapGroupsWithState`)
   * — the streaming form of the doc_id-uniqueness rule: instead of reporting
   * duplicates after the fact, later arrivals are dropped (or routed) online.
   * State is one boolean per key, partitioned by doc_id hash across
   * executors. At 10^12 keys unbounded state OOMs the state store, so
   * `stateTtl` bounds it: a key idle longer than the TTL is evicted (its
   * next arrival is treated as first-seen again — the standard
   * dedup-within-horizon trade; None = exact dedup, unbounded state).
   */
  def dedupFirstSeen(stream: DataFrame, docKey: String,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    import org.apache.spark.sql.{Encoders, Row}
    implicit val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(stream.schema)
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    stream
      .groupByKey((r: Row) => r.getAs[String](docKey))
      .flatMapGroupsWithState[Boolean, Row](
        OM.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove() // TTL eviction: key forgotten, state bounded
            Iterator.empty
          } else if (state.exists) {
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis)) // refresh
            Iterator.empty // key already emitted in a prior batch
          } else {
            state.update(true)
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
            rows.take(1) // first occurrence within this batch wins
          }
      }
  }

  /** Violation-row stream writer (append mode, exactly-once via checkpointLocation). */
  def writeViolations(validated: DataFrame, docKey: String, outPath: String,
      checkpointPath: String): DataStreamWriter[Row] =
    ValidationRunner.violationRows(validated, docKey)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
}
