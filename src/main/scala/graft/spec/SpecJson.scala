package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/**
 * Portable JSON form of a [[Spec]] — the analog of `piqi compile`'s
 * self-contained piqi-list blob (`/root/reference/src/compile.ml:72-230`,
 * `piqilib/piqi_compile.ml`): the compiled schema serialized so another
 * process (or a later resumed run) can reload exactly the plan that
 * produced an output. Round-trips structurally: `fromJson(toJson(s)) == s`
 * for specs whose default literals are in the canonical JSON scalar domain
 * (boolean / long / double / string — the same domain piqi default literals
 * inhabit after parsing, `piqi.ml:568-615`). Int/Float defaults serialize
 * widened to long/double — the form [[Spec.resolved]] normalizes to — so
 * for those `toJson(fromJson(toJson(s))) == toJson(s)` (canonical-form
 * round-trip; the checkpoint fingerprint compares these JSON strings).
 * Deserialization re-runs all SpecChecks, like `piqi compile` re-checking
 * loaded modules.
 */
object SpecJson {

  private val mapper = new ObjectMapper()

  def toJson(spec: Spec): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(specNode(spec))

  private def specNode(spec: Spec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("module", spec.module)
    o.put("root", spec.root)
    o.put("strict", spec.strict)
    o.put("maxDepth", spec.maxDepth)
    val defs = o.putArray("defs")
    spec.defs.foreach(d => defs.add(defNode(d)))
    val rules = o.putArray("rowRules")
    spec.rowRules.foreach(r => rules.add(ruleNode(r)))
    val imports = o.putArray("imports")
    spec.imports.foreach(i => imports.add(specNode(i)))
    o
  }

  private def typeNode(t: PiqiType): ObjectNode = {
    val o = mapper.createObjectNode()
    t match {
      case PBool => o.put("kind", "bool")
      case PInt(lo, hi) => o.put("kind", "int"); o.put("min", lo); o.put("max", hi)
      case PFloat => o.put("kind", "float")
      case PFloat32 => o.put("kind", "float32")
      case PUInt64 => o.put("kind", "uint64")
      case PString => o.put("kind", "string")
      case PBinary => o.put("kind", "binary")
      case PAny => o.put("kind", "any")
      case TypeRef(n) => o.put("kind", "ref"); o.put("name", n)
    }
    o
  }

  private def constraintNode(c: Constraint): ObjectNode = {
    val o = mapper.createObjectNode()
    c match {
      case MatchesRegex(r) => o.put("kind", "regex"); o.put("regex", r)
      case Base64 => o.put("kind", "base64")
      case ValidUtf8 => o.put("kind", "utf8")
      case InRange(lo, hi) => o.put("kind", "range"); o.put("min", lo); o.put("max", hi)
      case OneOf(vs) =>
        o.put("kind", "oneof"); val a = o.putArray("values"); vs.foreach(a.add)
    }
    o
  }

  private def defaultNode(o: ObjectNode, d: Any): Unit = d match {
    case b: Boolean => o.put("default", b)
    case i: Int => o.put("default", i.toLong)
    case l: Long => o.put("default", l)
    case f: Float => o.put("default", f.toDouble)
    case x: Double => o.put("default", x)
    case s: String => o.put("default", s)
    // full-domain uint64 defaults (2^63..2^64−1 exceed the JSON-long domain):
    // serialized as decimal strings; Spec.resolved re-normalizes by field
    // type after deserialization, so compiled plans are identical
    case bd: java.math.BigDecimal => o.put("default", bd.toBigInteger.toString)
    case bi: java.math.BigInteger => o.put("default", bi.toString)
    case other => throw new SpecException(
      s"unsupported default literal type for serialization: ${other.getClass.getName}")
  }

  private def fieldNode(f: PField): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", f.name)
    o.set[ObjectNode]("type", typeNode(f.tpe))
    f.mode match {
      case Required => o.put("mode", "required")
      case Optional(d) => o.put("mode", "optional"); d.foreach(defaultNode(o, _))
      case Repeated => o.put("mode", "repeated")
      case Flag => o.put("mode", "flag")
    }
    if (f.constraints.nonEmpty) {
      val a = o.putArray("constraints"); f.constraints.foreach(c => a.add(constraintNode(c)))
    }
    f.jsonName.foreach(o.put("jsonName", _))
    if (f.deprecated) o.put("deprecated", true)
    o
  }

  private def defNode(d: TypeDef): ObjectNode = {
    val o = mapper.createObjectNode()
    d match {
      case RecordDef(n, fs) =>
        o.put("kind", "record"); o.put("name", n)
        val a = o.putArray("fields"); fs.foreach(f => a.add(fieldNode(f)))
      case VariantDef(n, os) =>
        o.put("kind", "variant"); o.put("name", n)
        val a = o.putArray("options")
        os.foreach { op =>
          val oo = mapper.createObjectNode(); oo.put("name", op.name)
          op.tpe.foreach(t => oo.set[ObjectNode]("type", typeNode(t)))
          op.jsonName.foreach(oo.put("jsonName", _))
          a.add(oo)
        }
      case EnumDef(n, os) =>
        o.put("kind", "enum"); o.put("name", n)
        val a = o.putArray("options"); os.foreach(a.add)
      case ListDef(n, e, cs) =>
        o.put("kind", "list"); o.put("name", n)
        o.set[ObjectNode]("elem", typeNode(e))
        if (cs.nonEmpty) { val a = o.putArray("constraints"); cs.foreach(c => a.add(constraintNode(c))) }
      case AliasDef(n, t, cs) =>
        o.put("kind", "alias"); o.put("name", n)
        o.set[ObjectNode]("target", typeNode(t))
        if (cs.nonEmpty) { val a = o.putArray("constraints"); cs.foreach(c => a.add(constraintNode(c))) }
    }
    o
  }

  private def ruleNode(r: RowRule): ObjectNode = {
    val o = mapper.createObjectNode()
    r match {
      case ExactlyOneOf(n, ps) =>
        o.put("kind", "exactly-one"); o.put("name", n)
        val a = o.putArray("paths"); ps.foreach(a.add)
      case AtMostOneOf(n, ps) =>
        o.put("kind", "at-most-one"); o.put("name", n)
        val a = o.putArray("paths"); ps.foreach(a.add)
      case StrictlyIncreasing(n, ap, f) =>
        o.put("kind", "increasing"); o.put("name", n)
        o.put("arrayPath", ap); o.put("field", f)
    }
    o
  }

  // ---------- deserialization ----------

  def fromJson(json: String): Spec = readSpec(mapper.readTree(json))

  private def readSpec(n: JsonNode): Spec = Spec(
    module = n.get("module").asText(),
    defs = n.get("defs").elements().asScala.map(readDef).toSeq,
    root = n.get("root").asText(),
    rowRules = Option(n.get("rowRules")).toSeq
      .flatMap(_.elements().asScala).map(readRule).toSeq,
    imports = Option(n.get("imports")).toSeq
      .flatMap(_.elements().asScala).map(readSpec).toSeq,
    strict = Option(n.get("strict")).exists(_.asBoolean()),
    maxDepth = Option(n.get("maxDepth")).map(_.asInt()).getOrElse(4))

  private def readType(n: JsonNode): PiqiType = n.get("kind").asText() match {
    case "bool" => PBool
    case "int" => PInt(n.get("min").asLong(), n.get("max").asLong())
    case "float" => PFloat
    case "float32" => PFloat32
    case "uint64" => PUInt64
    case "string" => PString
    case "binary" => PBinary
    case "any" => PAny
    case "ref" => TypeRef(n.get("name").asText())
    case other => throw new SpecException(s"unknown type kind '$other'")
  }

  private def readConstraint(n: JsonNode): Constraint = n.get("kind").asText() match {
    case "regex" => MatchesRegex(n.get("regex").asText())
    case "base64" => Base64
    case "utf8" => ValidUtf8
    case "range" => InRange(n.get("min").asDouble(), n.get("max").asDouble())
    case "oneof" => OneOf(n.get("values").elements().asScala.map(_.asText()).toSeq)
    case other => throw new SpecException(s"unknown constraint kind '$other'")
  }

  private def readConstraints(n: JsonNode): Seq[Constraint] =
    Option(n.get("constraints")).toSeq.flatMap(_.elements().asScala).map(readConstraint).toSeq

  private def readDefault(n: JsonNode): Any = {
    val d = n.get("default")
    if (d.isBoolean) d.asBoolean()
    else if (d.isIntegralNumber) d.asLong()
    else if (d.isFloatingPointNumber) d.asDouble()
    else d.asText()
  }

  private def readField(n: JsonNode): PField = PField(
    name = n.get("name").asText(),
    tpe = readType(n.get("type")),
    mode = n.get("mode").asText() match {
      case "required" => Required
      case "optional" =>
        Optional(if (n.has("default")) Some(readDefault(n)) else None)
      case "repeated" => Repeated
      case "flag" => Flag
      case other => throw new SpecException(s"unknown field mode '$other'")
    },
    constraints = readConstraints(n),
    jsonName = Option(n.get("jsonName")).map(_.asText()),
    deprecated = Option(n.get("deprecated")).exists(_.asBoolean()))

  private def readDef(n: JsonNode): TypeDef = n.get("kind").asText() match {
    case "record" => RecordDef(n.get("name").asText(),
      n.get("fields").elements().asScala.map(readField).toSeq)
    case "variant" => VariantDef(n.get("name").asText(),
      n.get("options").elements().asScala.map { oo =>
        POption(oo.get("name").asText(), Option(oo.get("type")).map(readType),
          Option(oo.get("jsonName")).map(_.asText()))
      }.toSeq)
    case "enum" => EnumDef(n.get("name").asText(),
      n.get("options").elements().asScala.map(_.asText()).toSeq)
    case "list" => ListDef(n.get("name").asText(), readType(n.get("elem")),
      readConstraints(n))
    case "alias" => AliasDef(n.get("name").asText(), readType(n.get("target")),
      readConstraints(n))
    case other => throw new SpecException(s"unknown def kind '$other'")
  }

  private def readRule(n: JsonNode): RowRule = n.get("kind").asText() match {
    case "exactly-one" => ExactlyOneOf(n.get("name").asText(),
      n.get("paths").elements().asScala.map(_.asText()).toSeq)
    case "at-most-one" => AtMostOneOf(n.get("name").asText(),
      n.get("paths").elements().asScala.map(_.asText()).toSeq)
    case "increasing" => StrictlyIncreasing(n.get("name").asText(),
      n.get("arrayPath").asText(), n.get("field").asText())
    case other => throw new SpecException(s"unknown rule kind '$other'")
  }
}
