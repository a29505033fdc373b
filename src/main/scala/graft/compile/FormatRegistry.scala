package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import scala.collection.concurrent.TrieMap

/** Pluggable format-validator registry — the reference's
  * `formatValidators` lookup table (reference: Helpers.hs:31-50, a
  * name → validator association list; Validator.hs consults it and
  * treats tags with no entry as no-ops). The shipped table validates
  * only `"regex"` (Helpers.hs:51-56), reproduced here exactly; users
  * extend the table with [[register]], matching the reference's
  * extensibility-in-principle.
  *
  * One table serves all three engine surfaces:
  *   - the Catalyst compiler ([[SpecCompiler]] wraps the entry as a UDF
  *     column — a format check is arbitrary user code, the one keyword
  *     family with no built-in expression form),
  *   - the in-memory oracle ([[graft.oracle.OracleValidator]] calls the
  *     same function, so dual-engine fixtures cover registered formats),
  *   - the emitted-SQL artifact ([[graft.engine.SqlGen]] renders the
  *     entry's [[Entry.sqlName]]; [[graft.GraftFunctions.register]]
  *     installs every entry under that name, so artifacts emitted
  *     against registered formats stay runnable on any session that
  *     called it).
  */
object FormatRegistry {

  final class Entry private[FormatRegistry] (
      val name: String, val sqlName: String, check: String => Boolean) {
    /** Null-tolerant check — an absent (SQL NULL) value passes every
      * keyword except `required` (SURVEY.md §7.4).
      */
    val fn: String => Boolean = s => s == null || check(s)
    private val asUdf: UserDefinedFunction = udf(fn)
    def column(c: Column): Column = asUdf(c)
  }

  private val table = TrieMap[String, Entry](
    "regex" -> new Entry("regex", "graft_is_valid_regex",
      s => scala.util.Try(java.util.regex.Pattern.compile(s)).isSuccess))

  /** Register (or replace) a format validator for string values.
    * `check` sees only non-null strings. The entry's SQL surface name is
    * `graft_format_<name>` (non-alphanumerics sanitized to `_`); call
    * [[graft.GraftFunctions.register]] afterwards on sessions that run
    * emitted SQL artifacts referencing the format.
    */
  def register(name: String, check: String => Boolean): Entry = {
    val e = new Entry(name,
      "graft_format_" + name.map(c => if (c.isLetterOrDigit) c else '_'), check)
    table.put(name, e)
    e
  }

  /** The validator for a format tag, if one is registered (unregistered
    * tags are no-ops, like the reference's unmatched lookup).
    */
  def get(name: String): Option[Entry] = table.get(name)

  /** All entries, stably ordered (SQL registration, diagnostics). */
  def entries: Seq[Entry] = table.values.toSeq.sortBy(_.name)

  /** The entry backing a compiled ScalaUDF's function — how
    * [[graft.engine.SqlGen]] maps a UDF node back to its SQL name.
    */
  def forFunction(f: AnyRef): Option[Entry] = table.values.find(_.fn eq f)
}
