package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parses draft-3 schema JSON into [[SchemaSpec]] with the reference's
  * defaulting rules, and resolves `\$ref` graphs by inlining.
  *
  * Semantics mirrored from the reference's `FromJSON (Schema ref)`
  * (reference: src/Data/Aeson/Schema/Types.hs:176-225): absent fields take
  * the `empty` defaults; `type` / `disallow` / `extends` accept a single
  * value or an array (`singleOrArray`, Types.hs:215-220); `dependencies`
  * entries are property-name(s) or a subschema (Types.hs:222-224).
  */
object SchemaParser {

  /** Parse schema JSON text. Numbers parse as BigDecimal for exactness
    * (the reference uses arbitrary-precision Scientific). `dialect`
    * selects how `pattern`/`patternProperties` sources are read:
    * [[PatternDialect.Java]] (default, = `rlike`) or the opt-in
    * [[PatternDialect.Posix]] matching the reference's regex-tdfa ERE
    * (translated once here, so engine and oracle share the result).
    */
  def parse(jsonText: String,
      dialect: PatternDialect = PatternDialect.Java): SchemaSpec =
    fromJson(JsonMethods.parse(jsonText, useBigDecimalForDouble = true), dialect)

  def parseValue(jsonText: String): JValue =
    JsonMethods.parse(jsonText, useBigDecimalForDouble = true)

  def fromJson(j: JValue,
      dialect: PatternDialect = PatternDialect.Java): SchemaSpec = j match {
    case JObject(fields) =>
      val m = fields.toMap
      def opt(k: String): Option[JValue] = m.get(k).filter(_ != JNull)
      def str(k: String): Option[String] = opt(k).collect { case JString(s) => s }
      def bool(k: String, dflt: Boolean): Boolean =
        opt(k).collect { case JBool(b) => b }.getOrElse(dflt)
      def num(k: String): Option[BigDecimal] = opt(k).collect {
        case JInt(i)     => BigDecimal(i)
        case JLong(l)    => BigDecimal(l)
        case JDecimal(d) => d
        case JDouble(d)  => BigDecimal(d)
      }
      def int(k: String, dflt: Int): Int =
        num(k).map(_.toInt).getOrElse(dflt)

      def typeChoice(v: JValue): Either[SchemaType, SchemaSpec] = v match {
        case JString(s) =>
          SchemaType.fromName(s)
            .map(Left(_))
            .getOrElse(throw new IllegalArgumentException(s"unknown type '$s'"))
        case o: JObject => Right(fromJson(o, dialect))
        case other =>
          throw new IllegalArgumentException(s"bad type entry: $other")
      }
      // single-or-array normalization (Types.hs:215-220)
      def singleOrArray(k: String): Seq[JValue] = opt(k) match {
        case Some(JArray(vs)) => vs
        case Some(v)          => Seq(v)
        case None             => Nil
      }

      val types = {
        val ts = singleOrArray("type").map(typeChoice)
        if (ts.isEmpty) Seq(Left(SchemaType.SAny): Either[SchemaType, SchemaSpec])
        else ts
      }
      val properties = opt("properties") match {
        case Some(JObject(ps)) => ps.map { case (k, v) => k -> fromJson(v, dialect) }.toMap
        case _                 => Map.empty[String, SchemaSpec]
      }
      val patternProperties = opt("patternProperties") match {
        case Some(JObject(ps)) =>
          ps.map { case (k, v) => SPattern(dialect.toJava(k)) -> fromJson(v, dialect) }
        case _ => Nil
      }
      def boolOrSchema(k: String): Either[Boolean, SchemaSpec] = opt(k) match {
        case Some(JBool(b))   => Left(b)
        case Some(o: JObject) => Right(fromJson(o, dialect))
        case _                => Left(true)
      }
      val items = opt("items") match {
        case Some(JArray(vs)) => Some(Right(vs.map(fromJson(_, dialect))))
        case Some(o: JObject) => Some(Left(fromJson(o, dialect)))
        case _                => None
      }
      val dependencies = opt("dependencies") match {
        case Some(JObject(ds)) =>
          ds.map {
            case (k, JString(p))  => k -> Left(Seq(p))
            case (k, JArray(ps))  => k -> Left(ps.collect { case JString(p) => p })
            case (k, o: JObject)  => k -> Right(fromJson(o, dialect))
            case (k, other) =>
              throw new IllegalArgumentException(s"bad dependency '$k': $other")
          }.toMap
        case _ => Map.empty[String, Either[Seq[String], SchemaSpec]]
      }
      val enumVals = opt("enum").collect { case JArray(vs) => vs }
      val enumDescs = opt("enumDescriptions").collect {
        case JArray(vs) => vs.collect { case JString(s) => s }
      }

      SchemaSpec(
        types = types,
        properties = properties,
        patternProperties = patternProperties,
        additionalProperties = boolOrSchema("additionalProperties"),
        items = items,
        additionalItems = boolOrSchema("additionalItems"),
        required = bool("required", dflt = false),
        dependencies = dependencies,
        minimum = num("minimum"),
        maximum = num("maximum"),
        exclusiveMinimum = bool("exclusiveMinimum", dflt = false),
        exclusiveMaximum = bool("exclusiveMaximum", dflt = false),
        minItems = int("minItems", 0),
        maxItems = num("maxItems").map(_.toInt),
        uniqueItems = bool("uniqueItems", dflt = false),
        pattern = str("pattern").map(src => SPattern(dialect.toJava(src))),
        minLength = int("minLength", 0),
        maxLength = num("maxLength").map(_.toInt),
        enumValues = enumVals,
        enumDescriptions = enumDescs,
        default = m.get("default"),
        title = str("title"),
        description = str("description"),
        format = str("format"),
        divisibleBy = num("divisibleBy"),
        disallow = singleOrArray("disallow").map(typeChoice),
        extendsSchemas = singleOrArray("extends").map(fromJson(_, dialect)),
        id = str("id"),
        ref = str("$ref"),
        dSchema = str("$schema")
      )
    case other =>
      throw new IllegalArgumentException(s"schema must be a JSON object, got $other")
  }

  /** Parse a named schema graph `{name: schemaJson, ...}`
    * (reference: `Graph f ref = Map ref (f ref)`, Types.hs:137-138).
    */
  def parseGraph(jsonText: String,
      dialect: PatternDialect = PatternDialect.Java): Map[String, SchemaSpec] =
    JsonMethods.parse(jsonText, useBigDecimalForDouble = true) match {
      case JObject(fields) => fields.map { case (k, v) => k -> fromJson(v, dialect) }.toMap
      case other =>
        throw new IllegalArgumentException(s"graph must be a JSON object, got $other")
    }

  /** Inline `\$ref`s by substitution, unrolling recursion up to `maxDepth`.
    *
    * The reference resolves refs by graph lookup at validation time
    * (Validator.hs:39-42) / name-table lookup at compile time
    * (CodeGen.hs:136-139); sibling keywords on a ref'ing schema are
    * ignored (delegation is total). A ref deeper than `maxDepth` becomes
    * the accept-everything schema — sound for data of bounded depth.
    * Missing refs are an error on both reference paths.
    */
  def inline(graph: Map[String, SchemaSpec], spec: SchemaSpec, maxDepth: Int = 16): SchemaSpec = {
    def go(s: SchemaSpec, depth: Int): SchemaSpec = s.ref match {
      case Some(r) =>
        val target = graph.getOrElse(
          r, throw new IllegalArgumentException(s"$$ref '$r' not in graph"))
        if (depth >= maxDepth) SchemaSpec.empty
        else go(target, depth + 1) // delegation is total: siblings ignored
      case None =>
        s.copy(
          types = s.types.map(_.map(go(_, depth + 1))),
          properties = s.properties.map { case (k, v) => k -> go(v, depth + 1) },
          patternProperties = s.patternProperties.map { case (p, v) => p -> go(v, depth + 1) },
          additionalProperties = s.additionalProperties.map(go(_, depth + 1)),
          items = s.items.map {
            case Left(one)   => Left(go(one, depth + 1))
            case Right(many) => Right(many.map(go(_, depth + 1)))
          },
          additionalItems = s.additionalItems.map(go(_, depth + 1)),
          dependencies = s.dependencies.map {
            case (k, Right(v)) => k -> Right(go(v, depth + 1))
            case kv            => kv
          },
          disallow = s.disallow.map(_.map(go(_, depth + 1))),
          extendsSchemas = s.extendsSchemas.map(go(_, depth + 1))
        )
    }
    go(spec, 0)
  }
}
