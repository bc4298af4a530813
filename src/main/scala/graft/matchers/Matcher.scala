package graft.matchers

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Labels

/** Label matchers — the reference's selection algebra
  * (`labels/selector.go:21-109`) with PromQL's anchoring convention
  * (patterns are fully anchored, cf. reference `querier.go:286`).
  *
  * The load-bearing semantic (reference `querier.go:331-396`,
  * `db_test.go:1165` TestNotMatcherSelectsLabelsUnsetSeries): a matcher is
  * evaluated against the label's value *or the empty string when the label
  * is absent*. Hence `x != "a"` and `x =~ ""` select series that do not
  * carry label `x` at all. Both the pure evaluator ([[Matcher.matches]])
  * and the Column compiler ([[Matcher.toColumn]]) route through that rule
  * in exactly one place each.
  */
sealed trait Matcher {
  def name: String

  /** Truth value against a single label value ("" = label absent). */
  def matchesValue(v: String): Boolean

  final def matches(lset: Labels): Boolean = matchesValue(lset.get(name))

  final def matches(lset: Map[String, String]): Boolean =
    matchesValue(lset.getOrElse(name, ""))
}

/** `name == value` (reference `labels/selector.go:44-64`). */
final case class Eq(name: String, value: String) extends Matcher {
  def matchesValue(v: String): Boolean = v == value
}

/** `name =~ pattern`, fully anchored (reference `labels/selector.go:66-84`). */
final case class Re(name: String, pattern: String) extends Matcher {
  private[matchers] val compiled = Pattern.compile(anchored)
  def anchored: String = "^(?:" + pattern + ")$"
  def matchesValue(v: String): Boolean = compiled.matcher(v).matches()
}

/** Negation wrapper: `!=` / `!~` (reference `labels/selector.go:98-109`). */
final case class Not(inner: Matcher) extends Matcher {
  def name: String = inner.name
  def matchesValue(v: String): Boolean = !inner.matchesValue(v)
}

/** `name ∈ values` — the compiled form of a regex answered through the
  * label dictionary (reference's set-lookup postings path,
  * `querier.go:406-412`): the dictionary rewrite evaluates the regex per
  * *distinct label value* and this matcher carries the surviving values.
  * `"" ∈ values` means absent labels match (the matches-empty rule). */
final case class InSet(name: String, values: Set[String]) extends Matcher {
  def matchesValue(v: String): Boolean = values.contains(v)
}

object Matcher {
  def neq(name: String, value: String): Matcher = Not(Eq(name, value))
  def notRe(name: String, pattern: String): Matcher = Not(Re(name, pattern))

  /** Syntactic match-everything detection: `=~".*"` (bare or anchored)
    * matches every present value AND the absent label, so it filters
    * nothing and can be dropped from any conjunction — the reference
    * resolves it to all postings rather than walking values. Purely
    * syntactic on the common spellings; a semantically-total regex
    * written another way just misses the fast path. */
  def matchesAll(m: Matcher): Boolean = m match {
    case Re(_, p) => p == ".*" || p == "^.*$" || p == "^(?:.*)$"
    case _        => false
  }

  /** Detects `a|b|c` alternations of literals — the reference's regex→set
    * fast path (`querier.go:284-324`) — so `=~"a|b|c"` compiles to an
    * `IN` list instead of a regex eval per row. Escaped metas (`fo\.o`)
    * unescape to their literal; any unescaped meta bails. One deliberate
    * divergence: the reference only fires inside its own `^(?:...)$`
    * wrapper, while our matchers anchor at compile time ([[Re.anchored]]),
    * so the bare spelling qualifies too. */
  def setMatches(pattern: String): Option[Seq[String]] = {
    val meta = ".+*?()|[]{}^$"
    val p =
      if (pattern.startsWith("^(?:") && pattern.endsWith(")$"))
        pattern.substring(4, pattern.length - 2)
      else pattern
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var escaped = false
    var i = 0
    while (i < p.length) {
      val ch = p.charAt(i)
      if (escaped) {
        // only regex metas (and backslash itself) may be escaped — an
        // escaped letter could be a character class (\d, \w): bail
        if (meta.indexOf(ch.toInt) >= 0 || ch == '\\') cur.append(ch)
        else return None
        escaped = false
      } else if (ch == '\\') escaped = true
      else if (ch == '|') { if (cur.nonEmpty) out += cur.toString; cur.clear() }
      else if (meta.indexOf(ch.toInt) >= 0) return None
      else cur.append(ch) // any non-meta char is literal (incl. unicode)
      i += 1
    }
    if (escaped) return None
    if (cur.nonEmpty) out += cur.toString
    // empty alternatives are dropped like the reference; the compiled
    // predicate re-adds the match-empty branch via matchesValue("")
    val res = out.result()
    if (res.isEmpty) None else Some(res)
  }

  /** [[setMatches]] restricted to *anchored* patterns (`^(?:a|b|c)$` or
    * `^(a|b|c)$`) — the only shape safe to rewrite under Spark's
    * unanchored RLIKE semantics (used by
    * [[graft.catalyst.RegexSetRewrite]]). */
  def anchoredSetMatches(pattern: String): Option[Seq[String]] = {
    val inner =
      if (pattern.startsWith("^(?:") && pattern.endsWith(")$"))
        Some(pattern.substring(4, pattern.length - 2))
      else if (pattern.startsWith("^(") && pattern.endsWith(")$"))
        Some(pattern.substring(2, pattern.length - 2))
      else None
    inner.flatMap(setMatches)
  }

  /** Compiles one matcher to a Column predicate. `resolve` maps a label
    * name to the Column holding its value where NULL means absent — a map
    * lookup `labels[name]` or a promoted physical column.
    *
    * The absent-label-is-empty-string rule is applied with null-aware
    * predicates rather than `coalesce(c, '')`, because a coalesce around
    * the column would block parquet filter pushdown; `IsNotNull && EqualTo`
    * and its negation `IsNull || Not(EqualTo)` both reach the scan. The
    * compiled predicate is never NULL (three-valued logic resolved here),
    * so `Not` is plain boolean negation.
    */
  def toColumn(m: Matcher, resolve: String => Column): Column = {
    val c = resolve(m.name)
    def compile(m: Matcher): Column = m match {
      case Eq(_, "")    => c.isNull || c === lit("")
      case Eq(_, value) => c.isNotNull && c === lit(value)
      case re @ Re(_, pattern) =>
        val base = setMatches(pattern) match {
          case Some(lits) => c.isin(lits: _*)
          case None       => c.rlike(re.anchored)
        }
        if (re.matchesValue("")) c.isNull || base
        else c.isNotNull && base
      case InSet(_, values) =>
        val present = values - ""
        val base = c.isin(present.toSeq: _*)
        if (values.contains("")) c.isNull || c === lit("") || base
        else c.isNotNull && base
      case Not(inner) => !compile(inner)
    }
    compile(m)
  }

  /** AND of matchers (reference `Selector.Matches`, `labels/selector.go:21-32`). */
  def conjunction(ms: Seq[Matcher], resolve: String => Column): Column =
    ms.map(toColumn(_, resolve)).reduceOption(_ && _).getOrElse(lit(true))
}
