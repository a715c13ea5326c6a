package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the dedup signature hot paths.
 *
 * The higher-order-function formulations run through interpreted lambda
 * dispatch (Spark's HOFs are CodegenFallback): the SimHash counter loop was
 * ~64 `zip_with` ops per token and the MinHash signature 32 full
 * `transform`+`array_min` passes per doc — measured 16.0 s and 6.5 s for
 * 5,050 docs respectively, i.e. the dominant cost of both dedup jobs and a
 * scale-killer multiplied by 10^12 docs. These expressions emit one tight
 * primitive Java loop per doc instead (the same pattern as [[VectorDot]]).
 *
 * Hash compatibility: both use Spark's own xxhash64 primitives (XXH64, seed
 * 42) so results are BIT-IDENTICAL to the generic Column forms — equivalence
 * is property-tested, null/empty edge cases included.
 */

/**
 * 64-bit SimHash over a token array (Charikar STOC'02): bit b of the result
 * is the sign of Σ_tokens (2·bit_b(xxhash64(token)) − 1).
 *
 * Exact HOF-equivalent semantics ([[graft.ops.Dedup.simhash64HOF]]):
 * null array → null; empty array → 0L (all counters 0, sign ≤ 0 → bit 0);
 * null token → hashed as Spark's xxhash64 of null (seed unchanged → 42).
 */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"Simhash64 requires array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L // xxhash64(null) leaves the seed unchanged
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 42L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $cnt[$b]++; else $cnt[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($cnt[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/**
 * MinHash signature over a shingle-hash array: slot i is
 * min_h trunc32(xxhash64(i, h)) — `numHashes` independent permutation
 * minima in ONE pass over the array (the HOF form re-scanned the array per
 * slot). Values are the TOP 32 BITS of the permutation hash, compared as
 * signed ints — standard 32-bit minhash: per-slot collision probability is
 * Jaccard + O(2^-32), indistinguishable for LSH, at HALF the signature
 * bytes (the signature table is cached and re-joined 3× in
 * [[graft.ops.Dedup.minhashNearDups]], so bytes are the scale cost).
 *
 * Exact HOF-equivalent semantics ([[graft.ops.Dedup.minhashSignatureHOF]]):
 * null or empty array → array of `numHashes` nulls (the HOF is
 * `array(array_min(...))` — the outer array() constructor never yields null,
 * and array_min of a null/empty slice is null); null element → contributes
 * trunc32(xxhash64(i)) alone (Spark's multi-arg xxhash64 skips null
 * children), i.e. the truncated per-slot seed.
 */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSignature requires array<long>, got $other")
    }

  /** Per-slot seed: xxhash64(i) over the int literal i = hashInt(i, 42). */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](numHashes)) // all null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes)) // all null
    val mins = Array.fill(numHashes)(Int.MaxValue)
    var i = 0
    while (i < n) {
      var k = 0
      if (arr.isNullAt(i)) {
        while (k < numHashes) {
          val s = (seeds(k) >>> 32).toInt
          if (s < mins(k)) mins(k) = s
          k += 1
        }
      } else {
        val h = arr.getLong(i)
        while (k < numHashes) {
          val x = (XXH64.hashLong(h, seeds(k)) >>> 32).toInt
          if (x < mins(k)) mins(k) = x
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val childGen = child.genCode(ctx)
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val n = ctx.freshName("n")
    val h = ctx.freshName("h")
    val x = ctx.freshName("x")
    val mins = ctx.freshName("mins")
    val result = ctx.freshName("result")
    val code =
      s"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData $result;
         |if (${childGen.isNull} || ${childGen.value}.numElements() == 0) {
         |  $result = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$numHashes]);
         |} else {
         |  int $n = ${childGen.value}.numElements();
         |  int[] $mins = new int[$numHashes];
         |  java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (${childGen.value}.isNullAt($i)) {
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        int $x = (int) ($seedsRef[$k] >>> 32);
         |        if ($x < $mins[$k]) $mins[$k] = $x;
         |      }
         |    } else {
         |      long $h = ${childGen.value}.getLong($i);
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        int $x = (int) (org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, $seedsRef[$k]) >>> 32);
         |        if ($x < $mins[$k]) $mins[$k] = $x;
         |      }
         |    }
         |  }
         |  $result = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $result;
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * Word-shingle hashes over a token array: token i hashes to
 * th(i) = xxhash64(token_i); shingle j combines th(j..j+k-1) with a chained
 * xxhash64; if fewer than k tokens, one whole-doc chain hash; result is
 * distinct (first-occurrence order).
 *
 * Exact HOF-equivalent semantics ([[graft.ops.Dedup.shingleHashesHOF]]) —
 * the HOF form was the REAL minhash bottleneck: its windows lambda reads
 * `th` via element_at, and Catalyst re-evaluates the whole
 * `transform(tokens, xxhash64)` array construction for every element_at
 * call inside the lambda (O(n²·k) token hashes per doc; measured 16.6 s
 * for 5,050 docs — with the 32 signature passes ALREADY native).
 * Chain shapes (all = Spark's multi-arg xxhash64 fold, seed 42):
 *   th(i)      = hashUTF8String(token_i, 42); null token → 42
 *   shingle j  = hashLong(th(j+k-1), … hashLong(th(j), 42))
 *   whole-doc  = fold over th of acc' = hashLong(h, hashLong(acc, 42)), acc₀=17
 * null tokens array → null.
 */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ShingleHashes requires array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) 42L else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val raw: Array[Long] =
      if (n < k) {
        var acc = 17L
        var j = 0
        while (j < n) { acc = XXH64.hashLong(th(j), XXH64.hashLong(acc, 42L)); j += 1 }
        Array(acc)
      } else {
        val m = n - (k - 1)
        val out = new Array[Long](m)
        var j = 0
        while (j < m) {
          var h = 42L
          var o = 0
          while (o < k) { h = XXH64.hashLong(th(j + o), h); o += 1 }
          out(j) = h
          j += 1
        }
        out
      }
    // distinct, first-occurrence order (array_distinct semantics)
    val seen = new java.util.HashSet[java.lang.Long]()
    val kept = new Array[Long](raw.length)
    var m2 = 0
    var j = 0
    while (j < raw.length) {
      if (seen.add(raw(j))) { kept(m2) = raw(j); m2 += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, m2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val m2 = ctx.freshName("m2")
      val th = ctx.freshName("th")
      val raw = ctx.freshName("raw")
      val kept = ctx.freshName("kept")
      val seen = ctx.freshName("seen")
      val acc = ctx.freshName("acc")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $th[$i] = $a.isNullAt($i) ? 42L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($a.getUTF8String($i), 42L);
         |}
         |long[] $raw;
         |if ($n < $k) {
         |  long $acc = 17L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($th[$j],
         |      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($acc, 42L));
         |  }
         |  $raw = new long[] { $acc };
         |} else {
         |  int $m = $n - ${k - 1};
         |  $raw = new long[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $h = 42L;
         |    for (int $o = 0; $o < $k; $o++) {
         |      $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($th[$j + $o], $h);
         |    }
         |    $raw[$j] = $h;
         |  }
         |}
         |java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
         |long[] $kept = new long[$raw.length];
         |int $m2 = 0;
         |for (int $j = 0; $j < $raw.length; $j++) {
         |  if ($seen.add($raw[$j])) { $kept[$m2++] = $raw[$j]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($kept, $m2));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/**
 * FUSED MinHash signature straight from the token array: exactly
 * `MinHashSignature(ShingleHashes(tokens, k), numHashes)` — proven by the
 * min-over-multiset ≡ min-over-set identity (ShingleHashes' array_distinct
 * step cannot change any per-slot minimum) and property-tested — but in ONE
 * pass with a k-slot circular buffer of token hashes: no intermediate
 * shingle ArrayData (n longs per doc), no HashSet dedup (one hash-set
 * insert per shingle ≈ several XXH64 calls), no second expression
 * evaluation. This is the signature leg of every minhash near-dup job —
 * the stage that is 79% CPU of the one-shuffle pipeline's wall time.
 */
case class MinHashFromTokens(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k > 0, "shingle size must be positive")
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashFromTokens requires array<string>, got $other")
    }

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](numHashes)) // tokens null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Int.MaxValue)
    @inline def update(h: Long): Unit = {
      var s = 0
      while (s < numHashes) {
        val x = (XXH64.hashLong(h, seeds(s)) >>> 32).toInt
        if (x < mins(s)) mins(s) = x
        s += 1
      }
    }
    if (n < k) { // whole-doc chain hash, ShingleHashes' short-doc form
      var acc = 17L
      var j = 0
      while (j < n) {
        val th = if (arr.isNullAt(j)) 42L else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        acc = XXH64.hashLong(th, XXH64.hashLong(acc, 42L))
        j += 1
      }
      update(acc)
    } else {
      val buf = new Array[Long](k)
      var i = 0
      while (i < n) {
        buf(i % k) = if (arr.isNullAt(i)) 42L else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        if (i >= k - 1) {
          var h = 42L
          var o = 0
          while (o < k) { h = XXH64.hashLong(buf((i - k + 1 + o) % k), h); o += 1 }
          update(h)
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashFusedSeeds", seeds, "long[]")
    val childGen = child.genCode(ctx)
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val o = ctx.freshName("o")
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val h = ctx.freshName("h")
    val x = ctx.freshName("x")
    val acc = ctx.freshName("acc")
    val buf = ctx.freshName("buf")
    val th = ctx.freshName("th")
    val mins = ctx.freshName("mins")
    val result = ctx.freshName("result")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val code =
      s"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData $result;
         |if (${childGen.isNull}) {
         |  $result = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$numHashes]);
         |} else {
         |  int $n = ${childGen.value}.numElements();
         |  int[] $mins = new int[$numHashes];
         |  java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |  if ($n < $k) {
         |    long $acc = 17L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $th = ${childGen.value}.isNullAt($j) ? 42L
         |        : $xxh.hashUTF8String(${childGen.value}.getUTF8String($j), 42L);
         |      $acc = $xxh.hashLong($th, $xxh.hashLong($acc, 42L));
         |    }
         |    for (int $s = 0; $s < $numHashes; $s++) {
         |      int $x = (int) ($xxh.hashLong($acc, $seedsRef[$s]) >>> 32);
         |      if ($x < $mins[$s]) $mins[$s] = $x;
         |    }
         |  } else {
         |    long[] $buf = new long[$k];
         |    for (int $i = 0; $i < $n; $i++) {
         |      $buf[$i % $k] = ${childGen.value}.isNullAt($i) ? 42L
         |        : $xxh.hashUTF8String(${childGen.value}.getUTF8String($i), 42L);
         |      if ($i >= ${k - 1}) {
         |        long $h = 42L;
         |        for (int $o = 0; $o < $k; $o++) {
         |          $h = $xxh.hashLong($buf[($i - ${k - 1} + $o) % $k], $h);
         |        }
         |        for (int $s = 0; $s < $numHashes; $s++) {
         |          int $x = (int) ($xxh.hashLong($h, $seedsRef[$s]) >>> 32);
         |          if ($x < $mins[$s]) $mins[$s] = $x;
         |        }
         |      }
         |    }
         |  }
         |  $result = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $result;
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromTokens =
    copy(child = newChild)
}

/**
 * Sign-bit LSH bucket id over an embedding array (random-hyperplane LSH,
 * Charikar STOC'02, hash-generated planes): bit b of the result is the sign
 * of Σ_i x_i · pc(seed,b,i) where pc ∈ {−1,+1} comes from
 * xxhash64(seed,b,i) parity.
 *
 * Exact HOF-equivalent semantics ([[Vectors.signBitsHOF]]): null array or
 * any null element → 0L (the HOF's per-bit aggregate turns null, and
 * `when(null ≥ 0)` falls to the 0 branch for every bit); per-bit projection
 * sums elements in ascending index order (bit-identical float addition).
 * The HOF form ran `bits × dim` interpreted lambda dispatches + an xxhash64
 * Column tree per element per bit — the inner loop of every bucketed ANN /
 * embedding near-dup job.
 */
case class SignBits(child: Expression, bits: Int, seed: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in 1..63")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SignBits requires array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Per-bit hash prefix: xxhash64(seed, bit, ·) folded over the first two args. */
  private lazy val bitSeeds: Array[Long] =
    Array.tabulate(bits)(b => XXH64.hashInt(b, XXH64.hashInt(seed, 42L)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L // HOF: zip_with pads → null projection → all bits 0
    val proj = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // null element nulls every projection
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var b = 0
      while (b < bits) {
        val pc = if (((XXH64.hashInt(i, bitSeeds(b)) % 2) + 2) % 2 == 0) 1.0 else -1.0
        proj(b) += x * pc
        b += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < bits) {
      if (proj(b) >= 0) bucket += (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("signBitSeeds", bitSeeds, "long[]")
    val childGen = child.genCode(ctx)
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val x = ctx.freshName("x")
    val h = ctx.freshName("h")
    val proj = ctx.freshName("proj")
    val sawNull = ctx.freshName("sawNull")
    val bucket = ctx.freshName("bucket")
    val code =
      s"""
         |${childGen.code}
         |long $bucket = 0L;
         |if (!${childGen.isNull} && ${childGen.value}.numElements() > 0) {
         |  int $n = ${childGen.value}.numElements();
         |  double[] $proj = new double[$bits];
         |  boolean $sawNull = false;
         |  for (int $i = 0; $i < $n && !$sawNull; $i++) {
         |    if (${childGen.value}.isNullAt($i)) { $sawNull = true; break; }
         |    double $x = (double) ${childGen.value}.$getter($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($i, $seedsRef[$b]);
         |      $proj[$b] += ((($h % 2L) + 2L) % 2L == 0L) ? $x : -$x;
         |    }
         |  }
         |  if (!$sawNull) {
         |    for (int $b = 0; $b < $bits; $b++) {
         |      if ($proj[$b] >= 0) $bucket += (1L << $b);
         |    }
         |  }
         |}
         |long ${ev.value} = $bucket;
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

/**
 * Count of positionally-equal elements between two `array<int>` columns —
 * the MinHash signature-agreement count, codegen'd. Exact semantics of the
 * r3 HOF form `aggregate(zip_with(a, b, _ === _ cast int), 0, _ + _)`
 * restricted to the non-null equal-length signatures produced by
 * [[MinHashSignature]]: either side null → null; a null ELEMENT pair slot
 * counts as not-equal (the HOF yielded null for the slot and aggregate's
 * `+` then nulled the total — but all-null signatures are filtered before
 * use, so the reachable domain agrees).
 */
case class IntArrayEqCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"IntArrayEqCount requires (array<int>, array<int>), got $other")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getInt(i) == b.getInt(i)) eq += 1
      i += 1
    }
    eq
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getInt($i) == $b.getInt($i)) $eq++;
         |}
         |${ev.value} = $eq;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntArrayEqCount =
    copy(left = newLeft, right = newRight)
}

object HashExpressions {
  /** Codegen'd sign-bit LSH bucket over an embedding column. */
  def signBitsNative(vec: Column, bits: Int, seed: Int): Column =
    GraftBridge.column(SignBits(GraftBridge.expression(vec), bits, seed))

  /** Codegen'd shingle hashes over an `array<string>` token column. */
  def shingleHashesNative(tokens: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), k))

  /** Codegen'd 64-bit SimHash over an `array<string>` token column. */
  def simhash64Native(tokens: Column): Column =
    GraftBridge.column(Simhash64(GraftBridge.expression(tokens)))

  /** Codegen'd MinHash signature (`numHashes` slots) over an `array<long>`
    * shingle-hash column. */
  def minhashSignatureNative(shingleHashes: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingleHashes), numHashes))

  /** FUSED codegen'd MinHash signature straight from an `array<string>`
    * token column — identical output to
    * `minhashSignatureNative(shingleHashesNative(tokens, k), numHashes)`
    * in one pass with no intermediate shingle array. */
  def minhashFromTokensNative(tokens: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashFromTokens(GraftBridge.expression(tokens), k, numHashes))

  /** Per-bucket verified MinHash pair generator over an
    * `array<struct<id, sig:array<int>>>` column (use in `select`, alias with
    * `.as(Seq("id_a","id_b","sig_sim"))`). */
  def minhashPairs(items: Column, numHashes: Int, threshold: Double): Column =
    GraftBridge.column(MinhashPairs(GraftBridge.expression(items), numHashes, threshold))

  /** Per-bucket verified SimHash (hamming ≤ max) pair generator over an
    * `array<struct<id, sig:long>>` column. */
  def hammingPairs(items: Column, maxHamming: Int): Column =
    GraftBridge.column(HammingPairs(GraftBridge.expression(items), maxHamming))

  /** Per-bucket verified cosine pair generator over an
    * `array<struct<id, v:array<double|float>>>` column of pre-normalized
    * vectors. */
  def cosinePairs(items: Column, threshold: Double): Column =
    GraftBridge.column(CosinePairs(GraftBridge.expression(items), threshold))

  /** Per-bucket UNVERIFIED candidate pair generator over a bare `array<id>`
    * column (narrow-shuffle banding; verify by re-join). */
  def idPairs(ids: Column): Column =
    GraftBridge.column(IdPairs(GraftBridge.expression(ids)))

  /** Codegen'd count of positionally-equal slots between two `array<int>`
    * signatures. */
  def intArrayEqCount(a: Column, b: Column): Column =
    GraftBridge.column(IntArrayEqCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
