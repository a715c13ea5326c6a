package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Vectors

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Two paths:
 *  - [[bruteTopK]]: exact cosine top-k — the correctness baseline. The
 *    scale-relevant part is HOW the top-k is taken: a typed `Aggregator`
 *    with a bounded heap gives map-side partial top-k (each partition
 *    contributes ≤k candidates to the shuffle), instead of a window rank
 *    that would shuffle every (query, doc) score to one reducer per query.
 *  - [[lshTopK]]: IVF-style scale path — sign-bit LSH buckets as coarse
 *    cells; queries probe their own cell (+ multiprobe by extra seeds),
 *    exact cosine only within probed cells.
 */
object Ann {

  /** (score, id) pair kept in heaps / results. */
  final case class Scored(score: Double, id: Long)

  /** Bounded min-heap aggregator: top-k by score with map-side partials. */
  class TopKAggregator(k: Int)
      extends Aggregator[Scored, scala.collection.mutable.PriorityQueue[Scored], Seq[Scored]] {
    private def ord: Ordering[Scored] = Ordering.by(s => -s.score) // min-heap on score
    override def zero = scala.collection.mutable.PriorityQueue.empty[Scored](ord)
    override def reduce(h: scala.collection.mutable.PriorityQueue[Scored], a: Scored) = {
      h.enqueue(a)
      while (h.size > k) h.dequeue()
      h
    }
    override def merge(h1: scala.collection.mutable.PriorityQueue[Scored],
        h2: scala.collection.mutable.PriorityQueue[Scored]) = {
      h2.foreach { s => h1.enqueue(s); while (h1.size > k) h1.dequeue() }
      h1
    }
    override def finish(h: scala.collection.mutable.PriorityQueue[Scored]): Seq[Scored] =
      h.toSeq.sortBy(s => (-s.score, s.id))
    override def bufferEncoder: Encoder[scala.collection.mutable.PriorityQueue[Scored]] =
      Encoders.kryo[scala.collection.mutable.PriorityQueue[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /**
   * Exact cosine top-k for each query vector. `queries` must be small
   * (driver-broadcastable); `docs` can be arbitrarily large.
   *
   * Plan shape: broadcast-nested-loop of docs × queries (narrow over docs),
   * then ONE partial-aggregable groupBy(query) with the bounded-heap
   * aggregator — shuffle volume is O(#queries × k × #partitions), never
   * O(#docs).
   */
  def bruteTopK(docs: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(col(idCol).cast(LongType).as("doc_id"), col(vecCol).as("dv"))
    val q = queries.select(col(qIdCol).cast(LongType).as("query_id"), col(qVecCol).as("qv"))
    val scored = d.join(broadcast(q))
      .where(col("doc_id") =!= col("query_id")) // self-match excluded
      .select(col("query_id"), col("doc_id"),
        Vectors.cosine(col("dv"), col("qv")).as("score"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("score"), col("doc_id")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("score"))
  }

  /**
   * LSH-bucketed ANN: coarse quantization by sign-bit buckets (IVF analog).
   * Docs are assigned to one cell per probe seed; each query probes the
   * same cells; exact cosine within cells; global top-k per query from the
   * per-cell candidates. Recall < 1.0 (approximate); `probes` and `bits`
   * tune the recall/cost trade-off.
   *
   * `maxCell` bounds any (probe,cell)'s doc count (a hot cell under
   * clustered/duplicated embeddings otherwise scans every member per
   * matching query); docs in over-full cells are dropped from THAT probe
   * only — other probe seeds still cover them. 0 disables the cap.
   */
  def lshTopK(docs: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String, k: Int, bits: Int = 6, probes: Int = 3,
      maxCell: Int = 1000000): DataFrame = {
    val d0 = docs.select(col(idCol).cast(LongType).as("doc_id"), col(vecCol).as("dv"))
    val dBuckets0 = d0.select(col("doc_id"), col("dv"),
      posexplode(array((0 until probes).map(s => Vectors.signBits(col("dv"), bits, 42 + s)): _*)))
      .withColumnRenamed("pos", "probe").withColumnRenamed("col", "cell")
    val dBuckets =
      if (maxCell <= 0) dBuckets0
      else {
        val small = dBuckets0.groupBy("probe", "cell").agg(count(lit(1)).as("_csz"))
          .where(col("_csz") <= maxCell).drop("_csz")
        dBuckets0.join(small, Seq("probe", "cell"))
      }
    val q0 = queries.select(col(qIdCol).cast(LongType).as("query_id"), col(qVecCol).as("qv"))
    // multi-probe (Lv et al., VLDB'07): each query also probes every 1-bit-flip
    // neighbor of its cell — boundary-adjacent docs land one sign flip away,
    // so this buys most of the recall that more tables would, without
    // re-bucketing the (huge) doc side
    val qBuckets = q0.select(col("query_id"), col("qv"),
      posexplode(array((0 until probes).map(s => Vectors.signBits(col("qv"), bits, 42 + s)): _*)))
      .withColumnRenamed("pos", "probe").withColumnRenamed("col", "cell0")
      .select(col("query_id"), col("qv"), col("probe"),
        explode(array((Seq(col("cell0")) ++
          (0 until bits).map(b => col("cell0").bitwiseXOR(lit(1L << b)))): _*)).as("cell"))

    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    dBuckets.join(broadcast(qBuckets), Seq("probe", "cell"))
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), Vectors.cosine(col("dv"), col("qv")).as("score"))
      .dropDuplicates("query_id", "doc_id")
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id").as("neighbor_id"), col("score"))
  }

  // ---------- IVF (trained coarse quantizer) ----------

  /**
   * Train an IVF coarse quantizer: deterministic bounded sample to the
   * driver, Lloyd's k-means locally (cheap: sampleN × nCells × dim × iters
   * flops on small constants), centroids returned for broadcasting into
   * [[ivfTopK]]'s assignment expression. Sampling is hash-ordered (xxhash64
   * of the id), so the result is independent of partitioning and stable
   * across runs — no RNG. Empty clusters respawn on the farthest sampled
   * point (standard Lloyd's repair).
   */
  def trainCentroids(docs: DataFrame, idCol: String, vecCol: String, nCells: Int,
      sampleN: Int = 20000, iters: Int = 5): Array[Array[Double]] = {
    require(nCells > 0 && sampleN >= nCells, "need sampleN >= nCells > 0")
    // poisoned rows (null vector, null element, ragged dim) are SKIPPED,
    // not fatal — one bad embedding must not kill quantizer training
    val raw = docs
      .select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleN)
      .select(col(vecCol).cast(ArrayType(DoubleType)))
      .collect()
      .flatMap { r =>
        if (r.isNullAt(0)) None
        else {
          val s = r.getSeq[java.lang.Double](0)
          if (s.isEmpty || s.exists(_ == null)) None
          else Some(s.map(_.doubleValue).toArray)
        }
      }
    require(raw.nonEmpty, "no usable vectors to train on")
    val dim = raw(0).length
    val sample = raw.filter(_.length == dim) // drop ragged outliers
    // init: the hash-order sample's first nCells vectors (deterministic)
    val cent = Array.tabulate(math.min(nCells, sample.length))(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cent.length)(new Array[Double](dim))
      val counts = new Array[Long](cent.length)
      var si = 0
      while (si < sample.length) {
        val v = sample(si)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cent.length) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - cent(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
        si += 1
      }
      var c = 0
      while (c < cent.length) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cent(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } else {
          // empty cluster: respawn on the sample point farthest from its
          // centroid (deterministic repair)
          var worst = 0; var worstD = -1.0
          var si2 = 0
          while (si2 < sample.length) {
            val v = sample(si2)
            var bd = Double.MaxValue; var c2 = 0
            while (c2 < cent.length) {
              var d = 0.0; var j = 0
              while (j < dim) { val t = v(j) - cent(c2)(j); d += t * t; j += 1 }
              if (d < bd) bd = d
              c2 += 1
            }
            if (bd > worstD) { worstD = bd; worst = si2 }
            si2 += 1
          }
          cent(c) = sample(worst).clone()
        }
        c += 1
      }
      it += 1
    }
    cent
  }

  /**
   * IVF ANN: docs are assigned to their nearest trained centroid (ONE cell
   * per doc — unlike LSH's per-probe re-bucketing, the inverted file is a
   * single partition of the corpus); queries probe their `nProbe` nearest
   * cells; exact cosine within probed cells; global top-k per query.
   *
   * THE CELL COUNT IS THE SCALE DIAL: cells ≈ √n keeps per-cell lists at
   * √n docs, so a query scans nProbe·√n candidates — the standard IVF
   * cost model — where the fixed-width LSH variant's cells grow linearly
   * with n. Assignment is the codegen'd [[graft.functions.NearestCentroids]]
   * expression over broadcast centroids.
   */
  def ivfTopK(docs: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 4): DataFrame = {
    import graft.functions.VectorExpressions
    val d0 = docs.select(col(idCol).cast(LongType).as("doc_id"), col(vecCol).as("dv"))
    val dCells = d0.withColumn("cell",
      VectorExpressions.nearestCentroids(col("dv"), centroids, 1)(0))
    val q0 = queries.select(col(qIdCol).cast(LongType).as("query_id"), col(qVecCol).as("qv"))
    val qCells = q0.select(col("query_id"), col("qv"),
      explode(VectorExpressions.nearestCentroids(col("qv"), centroids, nProbe)).as("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    dCells.join(broadcast(qCells), Seq("cell"))
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), Vectors.cosine(col("dv"), col("qv")).as("score"))
      .dropDuplicates("query_id", "doc_id")
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id").as("neighbor_id"), col("score"))
  }
}
