package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ann
import graft.io.Convert
import graft.spec._

/** Quantified ANN recall + Convert schema-derivation coverage. */
class AnnRecallSpec extends SparkTestBase {

  test("lshTopK recall vs brute force >= 0.6 at k=5 on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 20)
    val exact = Ann.bruteTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(e, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, bits = 4, probes = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.2f (${approx.size} returned, ${exact.size} true)")
    assert(recall >= 0.6, f"recall $recall%.2f")
    // approximate results must still be TRUE neighbors by score (no junk):
    // every returned pair must appear in the exact top-20
    val exact20 = Ann.bruteTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 20)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact20))
  }

  test("ivfTopK (trained coarse quantizer) recall vs brute >= 0.6; results are true neighbors") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 20)
    val cents = Ann.trainCentroids(e, "vec_id", "embedding", nCells = 16,
      sampleN = 500, iters = 5)
    assert(cents.length === 16)
    // deterministic: training twice gives identical centroids
    val cents2 = Ann.trainCentroids(e, "vec_id", "embedding", nCells = 16,
      sampleN = 500, iters = 5)
    assert(cents.map(_.toSeq).toSeq === cents2.map(_.toSeq).toSeq)
    val exact = Ann.bruteTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(e, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, centroids = cents, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (${ivf.size} returned, ${exact.size} true)")
    assert(recall >= 0.6, f"recall $recall%.2f")
    val exact20 = Ann.bruteTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 20)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(exact20), "IVF returned a non-neighbor")
    // assignment sanity: every doc lands in a real cell
    val cells = e.select(graft.functions.VectorExpressions
        .nearestCentroids(col("embedding"), cents, 1)(0).as("cell"))
      .agg(min("cell"), max("cell")).collect()(0)
    assert(cells.getInt(0) >= 0 && cells.getInt(1) < 16)
  }

  test("Convert.sparkSchema derives struct/array/variant/alias/any shapes") {
    val spec = Spec("m", Seq(
      EnumDef("color", Seq("red")),
      VariantDef("payload", Seq(POption("num", Some(PInt.int32)), POption("tag", None))),
      ListDef("ints", PInt.int64),
      AliasDef("port", PInt.uint32),
      RecordDef("inner", Seq(PField("x", PBool, Required))),
      RecordDef("r", Seq(
        PField("a", PString, Required),
        PField("b", PBinary, Optional()),
        PField("c", TypeRef("color"), Optional()),
        PField("d", TypeRef("payload"), Optional()),
        PField("e", TypeRef("ints"), Optional()),
        PField("f", TypeRef("port"), Optional()),
        PField("g", TypeRef("inner"), Optional()),
        PField("h", PAny, Optional()),
        PField("reps", TypeRef("inner"), Repeated),
        PField("fl", PBool, Flag)))), "r")
    val schema = Convert.sparkSchema(spec)
    assert(schema("a").dataType === StringType)
    assert(schema("b").dataType === BinaryType)
    assert(schema("c").dataType === StringType) // enum → string
    assert(schema("d").dataType ===
      StructType(Seq(StructField("num", LongType), StructField("tag", BooleanType))))
    assert(schema("e").dataType === ArrayType(LongType))
    assert(schema("f").dataType === LongType) // alias unwraps
    assert(schema("g").dataType === StructType(Seq(StructField("x", BooleanType))))
    assert(schema("h").dataType === StringType) // piqi-any raw capture
    assert(schema("reps").dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("x").dataType === BooleanType)
    assert(schema("fl").dataType === BooleanType) // flag desugared
  }
}
