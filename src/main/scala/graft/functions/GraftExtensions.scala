package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL surface for the native expressions — `SparkSessionExtensions`
 * registration so pure-SQL users (and `spark.sql(...)` pipelines) can call
 * the engine's codegen'd functions directly:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
 *   SELECT graft_simhash64(tokens), graft_sign_bits(embedding, 8, 42) FROM docs
 * }}}
 *
 * For an already-running session, [[GraftFunctions.register]] installs the
 * same functions into the session's registry.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every SQL-exposed native function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64",
      "graft_simhash64(tokens array<string>) - 64-bit SimHash over tokens",
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_simhash64(tokens)")
        Simhash64(args.head)
      }),
    ("graft_minhash_signature",
      "graft_minhash_signature(shingleHashes array<bigint>, numHashes int) - MinHash signature",
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_minhash_signature(shingleHashes, numHashes)")
        MinHashSignature(args.head, intLit(args(1), "numHashes"))
      }),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(tokens array<string>, k int) - distinct word-shingle hashes",
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_shingle_hashes(tokens, k)")
        ShingleHashes(args.head, intLit(args(1), "k"))
      }),
    ("graft_sign_bits",
      "graft_sign_bits(vec array<float|double>, bits int, seed int) - sign-bit LSH bucket",
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_sign_bits(vec, bits, seed)")
        SignBits(args.head, intLit(args(1), "bits"), intLit(args(2), "seed"))
      }),
    ("graft_vector_dot",
      "graft_vector_dot(a array<float|double>, b array<float|double>) - dot product",
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_vector_dot(a, b)")
        VectorDot(args.head, args(1))
      }))

  /** Install the functions into an existing session's registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, usage, builder)
    }
}
