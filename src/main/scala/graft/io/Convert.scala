package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.compile.{SpecCompiler, ValidationPlan}
import graft.spec._

/**
 * Format ingest + normalize/emit — the Spark analog of `piqi convert`
 * (`src/convert.ml:534-573`): read format X, validate against the spec,
 * re-emit format Y with optional defaults materialization.
 */
object Convert {

  /** Build the Spark read-schema for a spec's root record (all nullable —
    * requiredness is validated, not enforced by the reader). */
  def sparkSchema(spec: Spec): StructType = {
    val s = spec.resolved
    def dataTypeOf(t: PiqiType): DataType = t match {
      case PBool => BooleanType
      case _: PInt => LongType
      case PFloat => DoubleType
      case PFloat32 => FloatType
      case PString => StringType
      case PBinary => BinaryType
      case PAny => StringType // raw JSON capture, parsed lazily (piqobj.ml:267-318 analog)
      case TypeRef(n) => s.defTable(n) match {
        case RecordDef(_, fields) => StructType(fields.map(structField))
        case VariantDef(_, options) =>
          StructType(options.map(o => StructField(o.name,
            o.tpe.map(dataTypeOf).getOrElse(BooleanType), nullable = true)))
        case EnumDef(_, _) => StringType
        case ListDef(_, e, _) => ArrayType(dataTypeOf(e))
        case AliasDef(_, target, _) => dataTypeOf(target)
      }
    }
    def structField(f: PField): StructField = f.mode match {
      case Repeated => StructField(f.name, ArrayType(dataTypeOf(f.tpe)), nullable = true)
      case _ => StructField(f.name, dataTypeOf(f.tpe), nullable = true)
    }
    s.defTable(s.root) match {
      case RecordDef(_, fields) => StructType(fields.map(structField))
      case other => throw new SpecException(s"root must be a record, got $other")
    }
  }

  /**
   * JSON-string ingest with validation — `piqobj_of_json` semantics
   * (`piqilib/piqobj_of_json.ml`):
   *  - unparseable JSON → `parse:json` violation (reference raises a
   *    located error; we collect);
   *  - key-shape checks at EVERY record level via [[JsonShape.checkKeys]]:
   *    unknown keys (violation iff `spec.strict`, `piqobj_of_json.ml:31-37`,
   *    flag `src/convert.ml:499`), duplicate keys (always,
   *    `piqobj_of_json.ml:25-28`), object/array shape mismatches;
   *  - then the full compiled constraint pass.
   *
   * Returns the parsed columns + `violations` + `valid`.
   */
  def fromJson(jsonDf: DataFrame, jsonCol: String, spec: Spec): DataFrame = {
    val plan = SpecCompiler.compile(spec)
    val schema = sparkSchema(spec)
    val parsed = jsonDf
      .withColumn("_rec", from_json(col(jsonCol), schema))
      .withColumn("_keys", json_object_keys(col(jsonCol)))

    val parseVio = SpecCompiler.vio(
      col(jsonCol).isNotNull && col("_keys").isNull,
      "parse:json", "$", col(jsonCol))

    val shapeVio = JsonShape.checkKeys(col(jsonCol), spec)

    val flat = parsed.select(
      (schema.fields.map(f => col(s"_rec.${f.name}").as(f.name)) :+
        col(jsonCol).as("_raw") :+ parseVio.as("_pv") :+ shapeVio.as("_sv")): _*)
    flat
      .withColumn("violations", concat(col("_pv"), col("_sv"), plan.violations))
      .withColumn("valid", size(col("violations")) === 0)
      .drop("_pv", "_sv")
  }

  /**
   * Validate `piqi-any` payloads against their per-row typename — the
   * analog of the reference's lazy cross-conversion of `Any` values against
   * a registered type (`/root/reference/piqilib/piqobj.ml:267-401`, resolved
   * through the module db like `piqi_db.find_piqtype`): each row carries a
   * raw JSON payload (`anyCol`) and a type name (`typeCol`); the payload is
   * parsed and validated against the named spec from `registry`.
   *
   * Returns the input columns + `any_violations` + `any_valid`. Unknown
   * typenames yield an `unknown-type` violation (`piqi_db.ml:149-153`).
   * Execution shape: one filtered validate pass per registered type,
   * unioned — each pass is a narrow projection, so the job stays one scan
   * per type with no shuffle.
   */
  def validateAny(df: DataFrame, anyCol: String, typeCol: String,
      registry: Map[String, Spec]): DataFrame = {
    // ONE case-when projection over all registered types — no per-type scan,
    // no union, no shuffle: the typename dispatch is a column expression
    val branches = registry.toSeq.sortBy(_._1).map { case (name, spec) =>
      val plan = SpecCompiler.compile(spec)
      val rec = from_json(col(anyCol), sparkSchema(spec))
      val parseVio = SpecCompiler.vio(
        col(anyCol).isNotNull && json_object_keys(col(anyCol)).isNull,
        "parse:json", "$", col(anyCol))
      val vios = concat(parseVio, JsonShape.checkKeys(col(anyCol), spec),
        plan.violationsFor(rec))
      (col(typeCol) === name, vios)
    }
    val unknownVio = SpecCompiler.vio(lit(true), "unknown-type", "$",
      coalesce(col(typeCol), lit("null")))
    val dispatch = branches.foldRight(unknownVio) { case ((cond, vios), rest) =>
      when(cond, vios).otherwise(rest)
    }
    df.withColumn("any_violations", dispatch)
      .withColumn("any_valid", size(col("any_violations")) === 0)
  }

  /**
   * XML-string ingest with validation — the Spark-4 `from_xml` analog of
   * the reference's `piqobj_of_xml.ml` input path (342 LoC there; element
   * nesting ↔ record fields, repeated elements ↔ arrays, `doc/
   * encodings.md:168-189`). Unparseable XML → `parse:xml` violation, then
   * the full compiled constraint pass. XML has no duplicate-key notion and
   * unknown elements are not enumerable through `from_xml`, so key-shape
   * checks are JSON-only (documented deviation; the reference warns on
   * unknown XML elements).
   */
  def fromXml(xmlDf: DataFrame, xmlCol: String, spec: Spec): DataFrame = {
    val plan = SpecCompiler.compile(spec)
    val schema = sparkSchema(spec)
    val parsed = xmlDf.withColumn("_rec", from_xml(col(xmlCol), schema))
    // from_xml is PERMISSIVE: garbage input yields an all-null struct
    val allNull = schema.fields.map(f => col(s"_rec.${f.name}").isNull).reduce(_ && _)
    val parseVio = SpecCompiler.vio(col(xmlCol).isNotNull && allNull,
      "parse:xml", "$", col(xmlCol))
    val flat = parsed.select(
      (schema.fields.map(f => col(s"_rec.${f.name}").as(f.name)) :+
        col(xmlCol).as("_raw") :+ parseVio.as("_pv")): _*)
    flat
      .withColumn("violations", concat(col("_pv"), plan.violations))
      .withColumn("valid", size(col("violations")) === 0)
      .drop("_pv")
  }

  /**
   * Emit rows as XML — the `piqobj_to_xml.ml` analog (Spark 4 `to_xml`;
   * element nesting ↔ record fields, repeated fields ↔ repeated elements,
   * `doc/encodings.md:168-189`: no attributes, no namespaces). `rootTag`
   * plays `<value>`'s role there. `addDefaults` mirrors the JSON emitter's
   * output-stage defaults projection.
   */
  def toXml(df: DataFrame, plan: ValidationPlan, rootTag: String = "value",
      addDefaults: Boolean = false): DataFrame = {
    val base = if (addDefaults) plan.withDefaults(df) else df
    val dataCols = base.columns.filterNot(c => c == "violations" || c == "valid")
    base.select(to_xml(struct(dataCols.map(col): _*),
      java.util.Map.of("rootTag", rootTag)).as("xml"))
  }

  /**
   * Emit rows as JSON with reference output semantics
   * (`piqobj_to_json.ml:27-141`): `omitMissing=true` (the default there)
   * drops null fields; `addDefaults` materializes declared defaults first
   * (`src/convert.ml:316-324` — defaults are an output-stage projection).
   */
  def toJson(df: DataFrame, plan: ValidationPlan, addDefaults: Boolean = false,
      omitMissing: Boolean = true): DataFrame = {
    val base = if (addDefaults) plan.withDefaults(df) else df
    val dataCols = base.columns.filterNot(c => c == "violations" || c == "valid")
    base.select(to_json(struct(dataCols.map(col): _*),
      Map("ignoreNullFields" -> omitMissing.toString)).as("json"))
  }
}
