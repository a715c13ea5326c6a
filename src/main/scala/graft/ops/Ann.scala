package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
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

  /** Flat top-k buffer: paired primitive arrays + fill count. Encoded by
    * the ordinary product encoder as (array<bigint>, array<double>, int) —
    * an UnsafeRow-friendly layout, unlike a kryo-blob map, so shuffle
    * serialization is a flat copy and any future spill path stays on
    * UnsafeRow. Arrays are sized k once per buffer. */
  final case class TopKBuf(ids: Array[Long], scores: Array[Double], n: Int)

  /**
   * Bounded top-k aggregator with map-side partials, DISTINCT by id, and a
   * deterministic tie-break (score desc, then id asc — matching a
   * `row_number` over `orderBy(score.desc, id)`).
   *
   * The buffer holds at most k (id, score) entries, so the same candidate
   * arriving through several LSH probes / IVF cells costs one slot, not k
   * — no upstream `dropDuplicates` exchange is needed. Each partition
   * contributes ≤k entries to the one shuffle; the per-insert linear scan
   * (membership + worst entry in one pass) is O(k) on a tiny constant
   * (k ≲ 100 in any sane ANN) over two primitive arrays — cheaper in
   * practice than the boxed HashMap it replaces, and the buffer encodes
   * as flat arrays instead of a kryo object blob.
   */
  class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    require(k > 0, "k must be positive")
    private def beats(s: Double, id: Long, ws: Double, wid: Long): Boolean =
      s > ws || (s == ws && id < wid)
    private def add(b: TopKBuf, id: Long, s: Double): TopKBuf = {
      // one pass: bail on duplicate id, track the worst entry (lowest
      // score, ties broken to HIGHEST id — the same set a window rank
      // over (score desc, id asc) would keep)
      var worst = -1; var i = 0
      while (i < b.n) {
        if (b.ids(i) == id) return b
        if (worst < 0 || b.scores(i) < b.scores(worst) ||
            (b.scores(i) == b.scores(worst) && b.ids(i) > b.ids(worst))) worst = i
        i += 1
      }
      if (b.n < k) {
        b.ids(b.n) = id; b.scores(b.n) = s
        b.copy(n = b.n + 1)
      } else {
        if (beats(s, id, b.scores(worst), b.ids(worst))) {
          b.ids(worst) = id; b.scores(worst) = s
        }
        b
      }
    }
    override def zero: TopKBuf = TopKBuf(new Array[Long](k), new Array[Double](k), 0)
    override def reduce(b: TopKBuf, a: Scored): TopKBuf = add(b, a.id, a.score)
    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
      var out = b1; var i = 0
      while (i < b2.n) { out = add(out, b2.ids(i), b2.scores(i)); i += 1 }
      out
    }
    override def finish(b: TopKBuf): Seq[Scored] =
      (0 until b.n).map(i => Scored(b.scores(i), b.ids(i)))
        .sortBy(s => (-s.score, s.id))
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /**
   * Shared final stage for every ANN path: ONE partial-aggregable
   * groupBy(query_id) with the bounded distinct heap, then rank by heap
   * order. Shuffle volume is O(#queries × k × #partitions) heap entries —
   * never the candidate set — and there is no per-query window sort.
   */
  private[ops] def finishTopK(candidates: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    candidates
      .where(col("score").isNotNull)
      .groupBy(col("query_id"))
      .agg(topk(col("score"), col("doc_id")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("score"))
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
    finishTopK(scored, k)
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

    // per-(query,doc) dedup across probes happens INSIDE the bounded heap
    // (it is keyed by doc id), so the candidate stream feeds ONE partial
    // aggregation — no dropDuplicates exchange, no per-query window sort
    val cand = dBuckets.join(broadcast(qBuckets), Seq("probe", "cell"))
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), Vectors.cosine(col("dv"), col("qv")).as("score"))
    finishTopK(cand, k)
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
    val (sample, rawN) = hashOrderedSample(docs, idCol, vecCol, sampleN)
    require(sample.length >= math.min(nCells, rawN),
      s"only ${sample.length} usable vectors of modal dim ${sample(0).length}" +
        s" — too few to train $nCells cells")
    lloyds(sample, nCells, iters)
  }

  /**
   * Deterministic bounded driver sample of usable vectors for quantizer
   * training, shared by the IVF coarse quantizer and the PQ subquantizers:
   * hash-ordered (xxhash64 of the id — independent of partitioning, stable
   * across runs, no RNG), poisoned rows (null vector, null element) SKIPPED
   * not fatal, then filtered to the MODAL vector length (ties → smaller
   * dim, deterministic). Trusting the first row's length would let a single
   * ragged outlier that happens to hash first set the wrong dim and discard
   * every well-formed vector — the exact failure the skip-don't-die policy
   * exists to prevent. Returns (modal-dim sample, pre-filter usable count).
   */
  private[ops] def hashOrderedSample(docs: DataFrame, idCol: String,
      vecCol: String, sampleN: Int): (Array[Array[Double]], Int) = {
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
    val dim = raw.groupBy(_.length).view.mapValues(_.length).toSeq
      .minBy { case (len, n) => (-n, len) }._1
    (raw.filter(_.length == dim), raw.length)
  }

  /**
   * Driver-side Lloyd's k-means on an equal-length sample: deterministic
   * init (the sample's first k vectors), empty clusters respawned on the
   * farthest sampled point. Cheap by construction — sampleN × k × dim ×
   * iters flops on small constants.
   */
  private[ops] def lloyds(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    val cent = Array.tabulate(math.min(k, sample.length))(i => sample(i).clone())
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
    // cell = -1 marks unassignable vectors (null/ragged/NaN): filter them on
    // BOTH sides so garbage docs never join garbage queries
    val dCells = d0.withColumn("cell",
        VectorExpressions.nearestCentroids(col("dv"), centroids, 1)(0))
      .where(col("cell") >= 0)
    val q0 = queries.select(col(qIdCol).cast(LongType).as("query_id"), col(qVecCol).as("qv"))
    val qCells = q0.select(col("query_id"), col("qv"),
        explode(VectorExpressions.nearestCentroids(col("qv"), centroids, nProbe)).as("cell"))
      .where(col("cell") >= 0)
    val cand = dCells.join(broadcast(qCells), Seq("cell"))
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), Vectors.cosine(col("dv"), col("qv")).as("score"))
    finishTopK(cand, k)
  }
}
