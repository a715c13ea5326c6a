package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, GraftFunctions, Text, Vectors}
import graft.ops.Dedup

/** SQL surface: the native expressions registered as SQL functions must
  * agree with their DataFrame-API forms. */
class SqlSurfaceSpec extends SparkTestBase {

  test("registered SQL functions equal the DataFrame API forms") {
    GraftFunctions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    val docs = (0 until 50).map(i => (i.toLong, s"alpha beta tok$i gamma delta tok${i % 5}"))
      .toDF("id", "text")
    docs.withColumn("toks", Text.tokens(col("text"))).createOrReplaceTempView("sqldocs")

    val viaSql = spark.sql(
      """SELECT id,
        |  graft_simhash64(toks) AS sh,
        |  graft_minhash_signature(graft_shingle_hashes(toks, 3), 16) AS mh
        |FROM sqldocs""".stripMargin)
    val viaApi = docs.select(col("id"),
      Dedup.simhash64(col("text")).as("sh"),
      Dedup.minhashSignature(col("text"), 16).as("mh"))
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    emb.createOrReplaceTempView("sqlemb")
    val sqlVec = spark.sql(
      """SELECT vec_id, graft_sign_bits(embedding, 6, 42) AS b,
        |  graft_vector_dot(embedding, embedding) AS d FROM sqlemb""".stripMargin)
    val apiVec = emb.select(col("vec_id"),
      Vectors.signBits(col("embedding"), 6).as("b"),
      Vectors.dot(col("embedding"), col("embedding")).as("d"))
    assert(sqlVec.exceptAll(apiVec).count() === 0)

    // usage strings render through DESCRIBE FUNCTION
    val desc = spark.sql("DESCRIBE FUNCTION graft_sign_bits").collect().map(_.getString(0))
    assert(desc.exists(_.contains("graft_sign_bits")))
  }

  test("GraftExtensions installs every function via SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register all builders without error
    // builders are also directly usable
    GraftFunctions.all.foreach { case (name, usage, _) =>
      assert(name.startsWith("graft_")); assert(usage.nonEmpty)
    }
  }
}
