package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.compile.ValidationPlan

/**
 * Distributed execution of a compiled [[graft.compile.ValidationPlan]] —
 * the Spark analog of the reference's `do_convert` streaming loop
 * (`src/convert.ml:417-487`) and `piqi check` (`src/check.ml:43-60`): the
 * sequential one-document-at-a-time pull loop becomes a partition-parallel
 * scan with ONE wide codegen'd projection.
 *
 * Scale notes (designed for 10^12 rows / 1000 executors, tested local):
 *  - `validate` is a pure narrow projection: no shuffle, no state; reads
 *    prune to exactly the columns the spec references.
 *  - `summary` is a partial-aggregable groupBy (map-side combine absorbs
 *    per-partition volume before the shuffle).
 *  - `uniqueDuplicates` uses two-level (salted) aggregation so one hot key
 *    cannot OOM a reducer.
 *  - `refCheck` picks broadcast vs shuffle join by catalog cardinality.
 */
object ValidationRunner {

  /** Per-row validation with details: input columns + `violations` + `valid`.
    * Narrow, no shuffle. Use when violation detail rows will be emitted. */
  def validate(df: DataFrame, plan: ValidationPlan): DataFrame =
    df.withColumn("violations", plan.violations)
      .withColumn("valid", size(col("violations")) === 0)

  /** Count-only validation — the hot aggregate path: pure boolean/int
    * arithmetic, no detail-struct construction (plan-review finding: the
    * detail form spends most of its time building strings nobody reads
    * when the job only wants pass/fail counts). */
  def validateCounts(df: DataFrame, plan: ValidationPlan): DataFrame =
    df.withColumn("violation_count", plan.violationCount)
      .withColumn("valid", col("violation_count") === 0)

  /**
   * Exact violation rows: one output row per (doc, rule) violation — the
   * analog of the reference's located error messages
   * (`piqilib/piqloc.ml`; `file:line:col: message` becomes
   * `(docKey, rule, path, detail)`). Computed in the SAME projection that
   * feeds [[summary]], so a caller can cache `validate(df)` and run both.
   */
  def violationRows(validated: DataFrame, docKey: String,
      passthroughCols: Seq[String] = Nil): DataFrame = {
    val keep = (docKey +: passthroughCols).map(col)
    validated
      // explode (non-outer) emits nothing for empty arrays — no extra filter,
      // so the violations expression is evaluated exactly once per row.
      // `passthroughCols` ride along (e.g. a checkpoint bucket column) —
      // carrying them here avoids a re-join on docKey, which would multiply
      // violation rows when docKey is not unique (duplicate doc_ids are a
      // supported scenario: uniqueness is itself a validated rule).
      .select(keep :+ explode(col("violations")).as("v"): _*)
      .select(keep ++ Seq(col("v.rule").as("rule"), col("v.path").as("path"),
        col("v.detail").as("detail")): _*)
  }

  /**
   * Per-partition pass/fail summary (north rule: "per-partition pass/fail
   * summaries"). `partitionCols` are data-partition columns (e.g. source,
   * date bucket) — grouping is partial-agg friendly.
   */
  def summary(validated: DataFrame, partitionCols: Seq[String]): DataFrame = {
    val keys = partitionCols.map(col)
    val vioCount =
      if (validated.columns.contains("violation_count")) col("violation_count")
      else size(col("violations")).cast(LongType)
    validated
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("valid").cast(LongType)).as("n_valid"),
        sum((!col("valid")).cast(LongType)).as("n_invalid"),
        sum(vioCount).as("n_violations"))
  }

  /** Per-rule violation counts (for drift-style monitoring of rule hit-rates). */
  def ruleCounts(validated: DataFrame): DataFrame =
    validated
      .select(explode(col("violations")).as("v"))
      .groupBy(col("v.rule").as("rule"))
      .agg(count(lit(1)).as("n"))

  /**
   * Usage report for DEPRECATED fields (the reference carries
   * `Field.deprecated` as schema metadata, `piqi/piqi.piqi:132-175`): one
   * row per deprecated root field with its non-null occurrence count —
   * the migration-tracking twin of validation (a deprecated field is
   * legal, but you want to watch its usage decay). Single partial+final
   * aggregate, no shuffle beyond it.
   */
  def deprecatedUsage(df: DataFrame, plan: graft.compile.ValidationPlan): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val declared = plan.rootRecord.fields.filter(_.deprecated).map(_.name)
    // a frame that already projected a deprecated column away (natural
    // mid-migration state) reports (field, 0, n_docs) instead of throwing
    // an unresolved-column error
    val present = df.columns.toSet
    val fields = declared.filter(present)
    val absent = declared.filterNot(present)
    if (declared.isEmpty) return Seq.empty[(String, Long, Long)]
      .toDF("field", "n_present", "n_docs")
    val aggs = count(lit(1)).as("__docs") +:
      // sum over zero rows is SQL NULL — coalesce so an empty bucket
      // reports (field, 0, 0) instead of NPE-ing the report
      fields.map(f => coalesce(sum(col(f).isNotNull.cast(LongType)), lit(0L))
        .as(s"${f}__present"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nDocs = row.getLong(0)
    (fields.zipWithIndex.map { case (f, i) => (f, row.getLong(i + 1), nDocs) } ++
      absent.map(f => (f, 0L, nDocs)))
      .toDF("field", "n_present", "n_docs")
  }

  /**
   * Per-column stats in one pass: count / null-count / min / max /
   * approx-distinct (HyperLogLog++) — SURVEY.md §2.D row 1-2. One job, one
   * final aggregate; output long-format (one row per column) so the report
   * schema is stable regardless of the input schema.
   *
   * All metrics are computed in a single `agg` (Catalyst fuses them into one
   * partial+final hash aggregate), then unpivoted driver-side from the one
   * result row — NOT one job per column.
   */
  def columnStats(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def aggsFor(c: String): Seq[Column] = Seq(
      count(lit(1)).as(s"${c}__cnt"),
      sum(col(c).isNull.cast(LongType)).as(s"${c}__nulls"),
      min(col(c).cast(StringType)).as(s"${c}__min"),
      max(col(c).cast(StringType)).as(s"${c}__max"),
      (if (exactDistinct) count_distinct(col(c)) else approx_count_distinct(col(c)))
        .as(s"${c}__distinct"))
    val stats: Seq[(String, Seq[Any])] =
      if (!exactDistinct) {
        // HLL sketches partial-aggregate, so ONE pass over all columns is
        // strictly cheapest — the production path at unbounded scale.
        val aggs = cols.flatMap(aggsFor)
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        cols.zipWithIndex.map { case (c, i) => c -> (0 until 5).map(j => row.get(i * 5 + j)) }
      } else {
        // EXACT distincts over N columns in one agg make Catalyst Expand
        // every input row N-fold before the first shuffle — at 10^12 rows
        // that N× row blowup is the dominant cost of the audit path. N
        // per-column aggregates read the SAME total bytes from columnar
        // storage (each column scanned once, pruned to itself) with no
        // Expand; submitting them from concurrent driver threads overlaps
        // their stages, so wall time is max, not sum.
        val out = new Array[Seq[Any]](cols.size)
        @volatile var err: Option[Throwable] = None
        val threads = cols.zipWithIndex.map { case (c, i) =>
          val t = new Thread(() => {
            try {
              val a = aggsFor(c)
              val row = df.select(col(c)).agg(a.head, a.tail: _*).collect()(0)
              out(i) = (0 until 5).map(row.get)
            } catch { case e: Throwable => err = Some(e) }
          }, s"colstats-$c")
          t.start(); t
        }
        threads.foreach(_.join())
        err.foreach(e => throw e)
        cols.zipWithIndex.map { case (c, i) => c -> out(i) }
      }
    stats.map { case (c, s) =>
      (c, s(0).asInstanceOf[Long], s(1).asInstanceOf[Long],
        Option(s(2)).map(_.toString).orNull,
        Option(s(3)).map(_.toString).orNull,
        s(4).asInstanceOf[Long])
    }.toDF("column", "cnt", "nulls", "min_s", "max_s", "n_distinct")
  }

  /**
   * Per-group × per-column stats in ONE distributed aggregate (the
   * "per-partition metrics" of SURVEY.md §2.D): one output row per
   * (group, column) in long format. Unlike [[columnStats]] this never
   * collects wide rows to the driver — it unpivots with a generator, so it
   * scales to arbitrary group counts (data partitions at 10^12 scale).
   */
  def columnStatsByGroup(df: DataFrame, groupCol: String, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__cnt"),
        sum(col(c).isNull.cast(LongType)).as(s"${c}__nulls"),
        min(col(c).cast(StringType)).as(s"${c}__min"),
        max(col(c).cast(StringType)).as(s"${c}__max"),
        (if (exactDistinct) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__distinct"))
    }
    val wide = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    // unpivot: one struct per column, exploded distributedly
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__cnt").as("cnt"), col(s"${c}__nulls").as("nulls"),
        col(s"${c}__min").as("min_s"), col(s"${c}__max").as("max_s"),
        col(s"${c}__distinct").as("n_distinct"))
    }
    wide.select(col(groupCol), explode(array(entries: _*)).as("s"))
      .select(col(groupCol), col("s.column").as("column"), col("s.cnt").as("cnt"),
        col("s.nulls").as("nulls"), col("s.min_s").as("min_s"),
        col("s.max_s").as("max_s"), col("s.n_distinct").as("n_distinct"))
  }

  /**
   * Duplicate-key report (uniqueness of doc_id, SURVEY.md §2.D row 3):
   * `(key, cnt)` for every key appearing more than once.
   *
   * Plain `groupBy(key).count` is already skew-safe for COUNTING (hash
   * aggregate does map-side partial aggregation, so a hot key contributes
   * one partial row per input partition). We keep it as the default path.
   */
  def uniqueDuplicates(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt")).where(col("cnt") > 1)

  /**
   * Salted two-level variant for adversarial skew (north rule: "uniqueness
   * over doc_id via salted repartition"): level 1 aggregates on
   * (key, salt = crc32(partition-local counter domain)), bounding any
   * single reducer's share of a hot key to 1/S; level 2 merges the S
   * partials per key. Results are identical to [[uniqueDuplicates]]
   * (property-tested), it just bounds reducer fan-in at 10^12 scale.
   */
  def uniqueDuplicatesSalted(df: DataFrame, key: String, saltBuckets: Int = 64): DataFrame = {
    // salt = xxhash64 over (key, partition id): pure long-register codegen.
    // The previous crc32(concat_ws(...)) form built a string per row —
    // hashing the native values shuffles the same (key, salt) pairs for a
    // fraction of the per-row CPU. Any salt assignment yields identical
    // results (level 2 sums over salts); only the spread matters.
    val salted = df
      .select(col(key))
      .withColumn("_salt", pmod(xxhash64(col(key), spark_partition_id()), lit(saltBuckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
    salted.groupBy(col(key)).agg(sum(col("_partial")).as("cnt")).where(col("cnt") > 1)
  }

  /** Rows carrying a duplicated key (exact violation rows for the unique rule). */
  def duplicateRows(df: DataFrame, key: String): DataFrame = {
    val dups = uniqueDuplicates(df, key)
    // dup keys are (by definition of a mostly-unique key) a small set → broadcast
    df.join(broadcast(dups), Seq(key), "inner")
      .withColumn("rule", concat(lit("unique:"), lit(key)))
  }

  /**
   * Referential-integrity check (north rule: "referential checks on
   * media_ref against a reference catalog using broadcast vs sort-merge
   * join selection by cardinality") — left-anti join; rows whose `refCol`
   * does not resolve in `catalog.catKey` are violations, the analog of the
   * reference's unknown-name resolution error (`piqilib/piqi_db.ml:149-153`).
   *
   * Join strategy: if the catalog is (estimated) small, apply the
   * `broadcast` hint; else leave it to Catalyst/AQE (shuffled hash or SMJ).
   * `catalogRowHint` lets a caller pass known cardinality (e.g. from table
   * stats) to avoid the count job. The broadcast cutoff defaults to 1M rows
   * (~tens of MB for a wide key — a 10M default risked several-hundred-MB
   * broadcasts per executor).
   */
  def refCheck(df: DataFrame, refCol: String, catalog: DataFrame, catKey: String,
      broadcastMaxRows: Long = 1000000L, catalogRowHint: Option[Long] = None): DataFrame = {
    val catRows = catalogRowHint.getOrElse(catalog.count())
    val cat = catalog.select(col(catKey).as(refCol)).distinct()
    val rhs = if (catRows <= broadcastMaxRows) broadcast(cat) else cat
    df.where(col(refCol).isNotNull).join(rhs, Seq(refCol), "left_anti")
  }
}
