package graft.oracle

import graft.spec._
import org.json4s._

/** A single constraint violation: `cid` is a stable path-based constraint id
  * (e.g. `$.tokens.minItems`), shared with the Catalyst compiler so the
  * oracle's and the engine's violation sets are directly comparable.
  */
final case class Violation(cid: String, message: String)

/** In-memory reference interpreter — the differential-test oracle.
  *
  * A semantics-faithful re-expression of the reference's interpretive
  * `validate` (reference: src/Data/Aeson/Schema/Validator.hs:33-186):
  * error-accumulating (all violations reported, no short-circuit),
  * `\$ref` delegation, union types pass iff any alternative is clean,
  * draft-3 leaf keyword semantics. Exists only as a test oracle for the
  * Spark engine (SURVEY.md §5 layer 3); never runs on executors.
  */
object OracleValidator {

  def validate(graph: Map[String, SchemaSpec], spec: SchemaSpec, value: JValue): List[Violation] =
    validateAt(graph, spec, value, "$")

  /** Zero violations ⇔ valid (reference: Validator/Tests.hs:24-29). */
  def isValid(graph: Map[String, SchemaSpec], spec: SchemaSpec, value: JValue): Boolean =
    validate(graph, spec, value).isEmpty

  private def validateAt(g: Map[String, SchemaSpec], s: SchemaSpec, v: JValue, path: String): List[Violation] =
    s.ref match {
      // $ref delegates entirely; sibling keywords ignored (Validator.hs:39-42)
      case Some(r) =>
        val target = g.getOrElse(
          r, throw new IllegalArgumentException(s"$$ref '$r' not in graph"))
        validateAt(g, target, v, path)
      case None =>
        typeDispatch(g, s, v, path) ++
          enumCheck(s, v, path) ++
          disallowCheck(g, s, v, path) ++
          s.extendsSchemas.flatMap(base => validateAt(g, base, v, path))
    }

  // --- type dispatch (Validator.hs:44-46,52-75) ---

  private def typeDispatch(g: Map[String, SchemaSpec], s: SchemaSpec, v: JValue, path: String): List[Violation] =
    s.types match {
      case Seq(one) => validateChoice(g, s, one, v, path)
      case many =>
        val branchErrs = many.map(c => validateChoice(g, s, c, v, path))
        if (branchErrs.exists(_.isEmpty)) Nil
        else List(Violation(s"$path.type", s"no type alternative matched at $path"))
    }

  private def isIntegral(v: JValue): Boolean = v match {
    case JInt(_) | JLong(_) => true
    case JDecimal(d)        => d.isWhole
    case JDouble(d)         => d.isWhole
    case _                  => false
  }

  private def asNumber(v: JValue): Option[BigDecimal] = v match {
    case JInt(i)     => Some(BigDecimal(i))
    case JLong(l)    => Some(BigDecimal(l))
    case JDecimal(d) => Some(d)
    case JDouble(d)  => Some(BigDecimal(d))
    case _           => None
  }

  private def validateChoice(g: Map[String, SchemaSpec], s: SchemaSpec,
      choice: Either[SchemaType, SchemaSpec], v: JValue, path: String): List[Violation] =
    choice match {
      case Right(sub) => validateAt(g, sub, v, path)
      case Left(t)    => validateType(g, s, t, v, path)
    }

  private def validateType(g: Map[String, SchemaSpec], s: SchemaSpec,
      t: SchemaType, v: JValue, path: String): List[Violation] = {
    import SchemaType._
    def mismatch = List(Violation(s"$path.type", s"expected ${t.name} at $path"))
    (t, v) match {
      case (SString, JString(str))          => validateString(s, str, path)
      case (SNumber, n) if asNumber(n).isDefined => validateNumber(s, asNumber(n).get, path)
      case (SInteger, n) if asNumber(n).isDefined =>
        if (isIntegral(n)) validateNumber(s, asNumber(n).get, path) else mismatch
      case (SBoolean, JBool(_))             => Nil
      case (SObject, o: JObject)            => validateObject(g, s, o, path)
      case (SArray, JArray(items))          => validateArray(g, s, items, path)
      case (SNull, JNull)                   => Nil
      // AnyType re-dispatches on the runtime constructor (Validator.hs:60-65)
      case (SAny, JString(str))             => validateString(s, str, path)
      case (SAny, n) if asNumber(n).isDefined => validateNumber(s, asNumber(n).get, path)
      case (SAny, o: JObject)               => validateObject(g, s, o, path)
      case (SAny, JArray(items))            => validateArray(g, s, items, path)
      case (SAny, _)                        => Nil
      case _                                => mismatch
    }
  }

  // --- leaf validators ---

  /** String checks (Validator.hs:102-113). Lengths are code-point counts. */
  private def validateString(s: SchemaSpec, str: String, path: String): List[Violation] = {
    val len = str.codePointCount(0, str.length)
    val minL =
      if (s.minLength > 0 && len < s.minLength)
        List(Violation(s"$path.minLength", s"length $len < ${s.minLength}"))
      else Nil
    val maxL = s.maxLength match {
      case Some(m) if len > m => List(Violation(s"$path.maxLength", s"length $len > $m"))
      case _                  => Nil
    }
    val pat = s.pattern match {
      case Some(p) if !p.matches(str) =>
        List(Violation(s"$path.pattern", s"'$str' does not match /${p.source}/"))
      case _ => Nil
    }
    // format tags resolve through the same pluggable registry the
    // Catalyst compiler consults (the reference's formatValidators
    // table, Helpers.hs:31-56); unregistered tags are no-ops
    val fmt = s.format.flatMap(graft.compile.FormatRegistry.get) match {
      case Some(e) if !e.fn(str) =>
        List(Violation(s"$path.format", s"'$str' fails format '${e.name}'"))
      case _ => Nil
    }
    minL ++ maxL ++ pat ++ fmt
  }

  /** Numeric checks with exact decimal arithmetic (Validator.hs:115-128,
    * Helpers.hs:59-67).
    */
  private def validateNumber(s: SchemaSpec, n: BigDecimal, path: String): List[Violation] = {
    val minV = s.minimum match {
      case Some(m) if (s.exclusiveMinimum && n <= m) || (!s.exclusiveMinimum && n < m) =>
        List(Violation(s"$path.minimum", s"$n below minimum $m"))
      case _ => Nil
    }
    val maxV = s.maximum match {
      case Some(m) if (s.exclusiveMaximum && n >= m) || (!s.exclusiveMaximum && n > m) =>
        List(Violation(s"$path.maximum", s"$n above maximum $m"))
      case _ => Nil
    }
    val div = s.divisibleBy match {
      case Some(d) if d != 0 && (n % d) != 0 =>
        List(Violation(s"$path.divisibleBy", s"$n not divisible by $d"))
      case _ => Nil
    }
    minV ++ maxV ++ div
  }

  /** Object checks (Validator.hs:135-162). Absent key = undefined; a
    * present JSON null still satisfies `required` (Validator.hs:159-162).
    */
  private def validateObject(g: Map[String, SchemaSpec], s: SchemaSpec,
      o: JObject, path: String): List[Violation] = {
    val fields = o.obj.toMap

    val propErrs = s.properties.toList.flatMap { case (name, sub) =>
      fields.get(name) match {
        case Some(v) => validateAt(g, sub, v, s"$path.$name")
        case None =>
          if (sub.required) List(Violation(s"$path.$name.required", s"missing property '$name'"))
          else Nil
      }
    }
    val patErrs = fields.toList.flatMap { case (name, v) =>
      s.patternProperties.collect {
        case (p, sub) if p.matches(name) => validateAt(g, sub, v, s"$path.$name")
      }.flatten
    }
    val additional = fields.filter { case (name, _) =>
      !s.properties.contains(name) && !s.patternProperties.exists(_._1.matches(name))
    }
    val addErrs = s.additionalProperties match {
      case Left(true)  => Nil
      case Left(false) =>
        additional.keys.toList.sorted.map(n =>
          Violation(s"$path.additionalProperties", s"unexpected property '$n'"))
      case Right(sub) =>
        additional.toList.flatMap { case (n, v) => validateAt(g, sub, v, s"$path.$n") }
    }
    val depErrs = s.dependencies.toList.flatMap { case (name, dep) =>
      if (!fields.contains(name)) Nil
      else dep match {
        case Left(requiredProps) =>
          requiredProps.filterNot(fields.contains).map(p =>
            Violation(s"$path.dependencies", s"'$name' requires '$p'"))
        case Right(sub) => validateAt(g, sub, o, path)
      }
    }
    propErrs ++ patErrs ++ addErrs ++ depErrs
  }

  /** Array checks (Validator.hs:164-186). `uniqueItems` is structural
    * pairwise distinctness (Helpers.hs:24-26).
    */
  private def validateArray(g: Map[String, SchemaSpec], s: SchemaSpec,
      items: List[JValue], path: String): List[Violation] = {
    val n = items.length
    val minI =
      if (s.minItems > 0 && n < s.minItems)
        List(Violation(s"$path.minItems", s"$n items < ${s.minItems}"))
      else Nil
    val maxI = s.maxItems match {
      case Some(m) if n > m => List(Violation(s"$path.maxItems", s"$n items > $m"))
      case _                => Nil
    }
    val uniq =
      if (s.uniqueItems && items.distinct.length != n)
        List(Violation(s"$path.uniqueItems", "duplicate items"))
      else Nil
    val itemErrs = s.items match {
      case None => Nil
      case Some(Left(one)) =>
        // single schema for all elements; engine collapses indices to [*]
        items.flatMap(v => validateAt(g, one, v, s"$path[*]")).distinct
      case Some(Right(tuple)) =>
        val positional = tuple.zipWithIndex.flatMap { case (sub, i) =>
          if (i < n) validateAt(g, sub, items(i), s"$path[$i]") else Nil
        }
        val rest = items.drop(tuple.length)
        val extra = s.additionalItems match {
          case Left(true)  => Nil
          case Left(false) =>
            if (rest.nonEmpty)
              List(Violation(s"$path.additionalItems", s"${rest.length} items beyond tuple"))
            else Nil
          case Right(sub) =>
            rest.flatMap(v => validateAt(g, sub, v, s"$path[*]")).distinct
        }
        positional ++ extra
    }
    minI ++ maxI ++ uniq ++ itemErrs
  }

  // --- enum / disallow (Validator.hs:47-48,77,89-92) ---

  private def enumCheck(s: SchemaSpec, v: JValue, path: String): List[Violation] =
    s.enumValues match {
      case Some(allowed) if !allowed.exists(jsonEq(_, v)) =>
        List(Violation(s"$path.enum", s"value not in enum at $path"))
      case _ => Nil
    }

  private def disallowCheck(g: Map[String, SchemaSpec], s: SchemaSpec,
      v: JValue, path: String): List[Violation] =
    s.disallow.flatMap {
      case Left(t) =>
        if (typeMatches(t, v))
          List(Violation(s"$path.disallow", s"disallowed type ${t.name} at $path"))
        else Nil
      case Right(sub) =>
        // fails iff the subschema ACCEPTS (Validator.hs:89-92)
        if (validateAt(g, sub, v, path).isEmpty)
          List(Violation(s"$path.disallow", s"matched disallowed schema at $path"))
        else Nil
    }.toList

  /** Constructor-level type match (Validator.hs:79-87). */
  def typeMatches(t: SchemaType, v: JValue): Boolean = {
    import SchemaType._
    (t, v) match {
      case (SAny, _)               => true
      case (SString, JString(_))   => true
      case (SNumber, n)            => asNumber(n).isDefined
      case (SInteger, n)           => asNumber(n).isDefined && isIntegral(n)
      case (SBoolean, JBool(_))    => true
      case (SObject, JObject(_))   => true
      case (SArray, JArray(_))     => true
      case (SNull, JNull)          => true
      case _                       => false
    }
  }

  /** Deep structural equality with numeric-value equality across
    * int/decimal representations (aeson `Value` Eq compares Scientific
    * values, not representations).
    */
  def jsonEq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (x, y) if asNumber(x).isDefined && asNumber(y).isDefined =>
      asNumber(x).get == asNumber(y).get
    case (JString(x), JString(y)) => x == y
    case (JBool(x), JBool(y))     => x == y
    case (JNull, JNull)           => true
    case (JArray(xs), JArray(ys)) =>
      xs.length == ys.length && xs.zip(ys).forall { case (x, y) => jsonEq(x, y) }
    case (JObject(xs), JObject(ys)) =>
      val (mx, my) = (xs.toMap, ys.toMap)
      mx.keySet == my.keySet && mx.forall { case (k, v) => jsonEq(v, my(k)) }
    case _ => false
  }
}
