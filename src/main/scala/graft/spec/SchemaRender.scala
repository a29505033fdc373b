package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Renders a [[SchemaSpec]] back to draft-3 schema JSON — the inverse of
  * [[SchemaParser]] (reference: the `ToJSON (Schema ref)` instance,
  * src/Data/Aeson/Schema/Types.hs:140-174, which serializes only the
  * fields that differ from `empty`). Round-trip law (asserted in
  * InferSpec): `SchemaParser.parse(SchemaRender.compact(s)) == s` for
  * any spec whose pattern sources are already in the Java dialect (the
  * parsed-normal form — `parse` stores Java-translated sources, so a
  * re-parse is identity).
  *
  * Used by [[graft.engine.SpecInfer]] to emit suggested specs as
  * standalone schema files a user can hand-edit and feed back to
  * `Main validate`.
  */
object SchemaRender {

  def render(s: SchemaSpec): JObject = {
    val fields = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
    def typeJson(t: Either[SchemaType, SchemaSpec]): JValue = t match {
      case Left(st)   => JString(st.name)
      case Right(sub) => render(sub)
    }
    def singleOrArray(vs: Seq[JValue]): JValue =
      if (vs.length == 1) vs.head else JArray(vs.toList)

    if (s.types != Seq(Left(SchemaType.SAny)))
      fields += "type" -> singleOrArray(s.types.map(typeJson))
    if (s.properties.nonEmpty)
      fields += "properties" -> JObject(
        s.properties.toList.sortBy(_._1).map { case (k, v) => k -> (render(v): JValue) })
    if (s.patternProperties.nonEmpty)
      fields += "patternProperties" -> JObject(
        s.patternProperties.toList.map { case (p, v) => p.source -> (render(v): JValue) })
    s.additionalProperties match {
      case Left(true)  => () // the default: omit
      case Left(false) => fields += "additionalProperties" -> JBool(false)
      case Right(sub)  => fields += "additionalProperties" -> render(sub)
    }
    s.items.foreach {
      case Left(one)   => fields += "items" -> render(one)
      case Right(many) => fields += "items" -> JArray(many.toList.map(render(_): JValue))
    }
    s.additionalItems match {
      case Left(true)  => ()
      case Left(false) => fields += "additionalItems" -> JBool(false)
      case Right(sub)  => fields += "additionalItems" -> render(sub)
    }
    if (s.required) fields += "required" -> JBool(true)
    if (s.dependencies.nonEmpty)
      fields += "dependencies" -> JObject(s.dependencies.toList.sortBy(_._1).map {
        case (k, Left(Seq(one))) => k -> (JString(one): JValue)
        case (k, Left(many))     => k -> (JArray(many.toList.map(JString(_): JValue)): JValue)
        case (k, Right(sub))     => k -> (render(sub): JValue)
      })
    s.minimum.foreach(v => fields += "minimum" -> JDecimal(v))
    s.maximum.foreach(v => fields += "maximum" -> JDecimal(v))
    if (s.exclusiveMinimum) fields += "exclusiveMinimum" -> JBool(true)
    if (s.exclusiveMaximum) fields += "exclusiveMaximum" -> JBool(true)
    if (s.minItems > 0) fields += "minItems" -> JInt(s.minItems)
    s.maxItems.foreach(v => fields += "maxItems" -> JInt(v))
    if (s.uniqueItems) fields += "uniqueItems" -> JBool(true)
    s.pattern.foreach(p => fields += "pattern" -> JString(p.source))
    if (s.minLength > 0) fields += "minLength" -> JInt(s.minLength)
    s.maxLength.foreach(v => fields += "maxLength" -> JInt(v))
    s.enumValues.foreach(vs => fields += "enum" -> JArray(vs.toList))
    s.enumDescriptions.foreach(ds =>
      fields += "enumDescriptions" -> JArray(ds.toList.map(JString(_): JValue)))
    s.default.foreach(d => fields += "default" -> d)
    s.title.foreach(t => fields += "title" -> JString(t))
    s.description.foreach(d => fields += "description" -> JString(d))
    s.format.foreach(f => fields += "format" -> JString(f))
    s.divisibleBy.foreach(v => fields += "divisibleBy" -> JDecimal(v))
    if (s.disallow.nonEmpty)
      fields += "disallow" -> singleOrArray(s.disallow.map(typeJson))
    if (s.extendsSchemas.nonEmpty)
      fields += "extends" -> singleOrArray(s.extendsSchemas.map(render(_): JValue))
    s.id.foreach(i => fields += "id" -> JString(i))
    s.ref.foreach(r => fields += "$ref" -> JString(r))
    s.dSchema.foreach(d => fields += "$schema" -> JString(d))
    JObject(fields.toList)
  }

  def compact(s: SchemaSpec): String = JsonMethods.compact(render(s))

  def pretty(s: SchemaSpec): String = JsonMethods.pretty(render(s))
}
