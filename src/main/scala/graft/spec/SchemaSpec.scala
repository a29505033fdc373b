package graft.spec

import org.json4s._

/** Allowed primitive type names of JSON Schema draft-3.
  *
  * Mirrors the reference's `SchemaType` sum
  * (reference: src/Data/Aeson/Schema/Types.hs:70-78).
  */
sealed abstract class SchemaType(val name: String)
object SchemaType {
  case object SString  extends SchemaType("string")
  case object SNumber  extends SchemaType("number")
  case object SInteger extends SchemaType("integer")
  case object SBoolean extends SchemaType("boolean")
  case object SObject  extends SchemaType("object")
  case object SArray   extends SchemaType("array")
  case object SNull    extends SchemaType("null")
  case object SAny     extends SchemaType("any")

  val all: Seq[SchemaType] =
    Seq(SString, SNumber, SInteger, SBoolean, SObject, SArray, SNull, SAny)

  def fromName(s: String): Option[SchemaType] = all.find(_.name == s)
}

/** A regex constraint: source text plus a compiled Java pattern.
  *
  * The reference compiles POSIX-ERE via regex-tdfa
  * (reference: src/Data/Aeson/Schema/Types.hs:41-67); we use
  * `java.util.regex` to match Spark's `rlike` semantics. Both sides use
  * unanchored containment matching (reference:
  * src/Data/Aeson/Schema/Validator.hs:112).
  */
final case class SPattern(source: String) {
  @transient lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(source)
  /** Containment match (like `rlike`, like regex-tdfa `match`). */
  def matches(s: String): Boolean = compiled.matcher(s).find()
}

/** One draft-3 schema node: the 30-field constraint record.
  *
  * Field-for-field capability match with the reference's `Schema ref`
  * (reference: src/Data/Aeson/Schema/Types.hs:104-135); defaults mirror
  * `empty` (reference: src/Data/Aeson/Schema/Types.hs:268-301).
  * `ref` targets are names in a driver-side schema graph
  * (reference: src/Data/Aeson/Schema/Types.hs:137-138).
  */
final case class SchemaSpec(
    types: Seq[Either[SchemaType, SchemaSpec]] = Seq(Left(SchemaType.SAny)),
    properties: Map[String, SchemaSpec] = Map.empty,
    patternProperties: Seq[(SPattern, SchemaSpec)] = Nil,
    additionalProperties: Either[Boolean, SchemaSpec] = Left(true),
    items: Option[Either[SchemaSpec, Seq[SchemaSpec]]] = None,
    additionalItems: Either[Boolean, SchemaSpec] = Left(true),
    required: Boolean = false,
    dependencies: Map[String, Either[Seq[String], SchemaSpec]] = Map.empty,
    minimum: Option[BigDecimal] = None,
    maximum: Option[BigDecimal] = None,
    exclusiveMinimum: Boolean = false,
    exclusiveMaximum: Boolean = false,
    minItems: Int = 0,
    maxItems: Option[Int] = None,
    uniqueItems: Boolean = false,
    pattern: Option[SPattern] = None,
    minLength: Int = 0,
    maxLength: Option[Int] = None,
    enumValues: Option[Seq[JValue]] = None,
    enumDescriptions: Option[Seq[String]] = None, // doc-only, never validated
    default: Option[JValue] = None,
    title: Option[String] = None,
    description: Option[String] = None,
    format: Option[String] = None,
    divisibleBy: Option[BigDecimal] = None,
    disallow: Seq[Either[SchemaType, SchemaSpec]] = Nil,
    extendsSchemas: Seq[SchemaSpec] = Nil,
    id: Option[String] = None,
    ref: Option[String] = None,
    dSchema: Option[String] = None
) {
  /** True when this node constrains nothing (all fields at defaults that
    * validate everything) — used for dead-check elision at compile time
    * (reference elides default-valued checks, e.g. CodeGen.hs:238,491).
    */
  def isEmpty: Boolean = this == SchemaSpec()
}

object SchemaSpec {
  /** The schema that accepts everything. */
  val empty: SchemaSpec = SchemaSpec()
}
