package graft.spec

/** Opt-in POSIX-ERE → Java-regex pattern translation (SURVEY.md §7.3).
  *
  * The reference compiles `pattern` with regex-tdfa, a POSIX-ERE engine
  * (reference: src/Data/Aeson/Schema/Types.hs:41-46,62-67); Spark's
  * `rlike` and the oracle's `SPattern` are `java.util.regex`. For the
  * *boolean containment* match both sides perform (reference
  * Validator.hs:112 `match`, engine `rlike`), POSIX leftmost-longest vs
  * Java backtracking cannot change the verdict — a match exists iff a
  * match exists — so the real dialect gap is SYNTAX: POSIX bracket
  * classes (`[[:alpha:]]`), which Java parses as a *different* character
  * class without error, silently diverging.
  *
  * This shim rewrites POSIX classes inside bracket expressions to their
  * `\p{…}` Java equivalents (same code-point sets for the ASCII range
  * POSIX defines). Selected via [[PatternDialect.Posix]] at schema-parse
  * time, so the engine (`rlike`) and the oracle (`SPattern.matches`) see
  * the same translated pattern.
  *
  * Documented limits of the claimed compatibility:
  *   - collating/equivalence bracket elements (`[.x.]`, `[=x=]`) are not
  *     translated (rejected);
  *   - patterns relying on Java-only syntax (lookaround, lazy
  *     quantifiers, `\d`-style escapes) are NOT POSIX ERE and should use
  *     the default Java dialect;
  *   - backreferences (`\1`) are not ERE and are rejected.
  */
object PosixRegex {

  private val Classes: Map[String, String] = Map(
    "alpha"  -> "\\p{Alpha}",
    "digit"  -> "\\p{Digit}",
    "alnum"  -> "\\p{Alnum}",
    "upper"  -> "\\p{Upper}",
    "lower"  -> "\\p{Lower}",
    "space"  -> "\\p{Space}",
    "punct"  -> "\\p{Punct}",
    "xdigit" -> "\\p{XDigit}",
    "cntrl"  -> "\\p{Cntrl}",
    "print"  -> "\\p{Print}",
    "graph"  -> "\\p{Graph}",
    "blank"  -> "\\p{Blank}")

  /** Translate a POSIX-ERE pattern to an equivalent Java regex. */
  def translate(pattern: String): String = {
    val out = new StringBuilder
    var i = 0
    var inBracket = false
    var bracketStart = -1
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (!inBracket) {
        if (c == '\\' && i + 1 < pattern.length) {
          val n = pattern.charAt(i + 1)
          if (n.isDigit) throw new IllegalArgumentException(
            s"backreference \\$n is not POSIX ERE: /$pattern/")
          out.append(c).append(n); i += 2
        } else {
          if (c == '[') { inBracket = true; bracketStart = i }
          out.append(c); i += 1
        }
      } else {
        if (c == '[' && i + 1 < pattern.length &&
            (pattern.charAt(i + 1) == ':' || pattern.charAt(i + 1) == '.' ||
             pattern.charAt(i + 1) == '=')) {
          val kind = pattern.charAt(i + 1)
          val close = pattern.indexOf(s"$kind]", i + 2)
          if (close < 0) throw new IllegalArgumentException(
            s"unterminated [$kind…$kind] element in /$pattern/")
          if (kind != ':') throw new IllegalArgumentException(
            s"collating/equivalence element [$kind…$kind] is not supported: /$pattern/")
          val name = pattern.substring(i + 2, close)
          out.append(Classes.getOrElse(name, throw new IllegalArgumentException(
            s"unknown POSIX class [:$name:] in /$pattern/")))
          i = close + 2
        } else if (c == '\\' && i + 1 < pattern.length) {
          out.append(c).append(pattern.charAt(i + 1)); i += 2
        } else if (c == '[') {
          // literal '[' inside a POSIX bracket expression; Java would
          // open a nested class — escape it
          out.append("\\["); i += 1
        } else if (c == ']') {
          // ']' immediately after '[' or '[^' is a literal in POSIX;
          // Java needs it escaped
          val literalPos = i == bracketStart + 1 ||
            (i == bracketStart + 2 && pattern.charAt(bracketStart + 1) == '^')
          if (literalPos) out.append("\\]")
          else { inBracket = false; out.append(c) }
          i += 1
        } else {
          out.append(c); i += 1
        }
      }
    }
    out.toString
  }
}

/** Which regex dialect `pattern` / `patternProperties` sources are in. */
sealed trait PatternDialect {
  /** Render a schema-supplied pattern as the Java-regex source both the
    * engine (`rlike`) and the oracle execute.
    */
  def toJava(source: String): String
}
object PatternDialect {
  /** Default: patterns are already Java regex (matches `rlike`). */
  case object Java extends PatternDialect {
    def toJava(source: String): String = source
  }
  /** Reference dialect: POSIX ERE, translated via [[PosixRegex]]. */
  case object Posix extends PatternDialect {
    def toJava(source: String): String = PosixRegex.translate(source)
  }
}
