package graft.matchers

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Labels

/** The matcher truth table ported from the reference's
  * TestPostingsForMatchers (querier_test.go:1830-2082) and
  * TestNotMatcherSelectsLabelsUnsetSeries (db_test.go:1165-1240),
  * evaluated against the pure model (FIXTURES.md §3).
  */
class MatcherSpec extends AnyFunSuite {
  import Matcher.{neq, notRe}

  // Scaled-down §3 fixture: i in 0..9, n in {"0".."2", "0_x"...}, j in {foo,bar}
  val fixture: Seq[Map[String, String]] = {
    val base = for {
      i <- 0 until 10
      (n, j) <- Seq("1" -> "foo", "1" -> "bar", "2" -> "foo", "0_1" -> "bar")
    } yield Map("i" -> i.toString, "n" -> n, "j" -> j)
    base :+ Map("n" -> "9") // a series with no i and no j
  }

  def run(ms: Matcher*): Set[Map[String, String]] =
    fixture.filter(l => ms.forall(_.matches(l))).toSet

  test("n=1 selects both j values") {
    assert(run(Eq("n", "1")).size == 20)
  }

  test("n=1, j=foo") {
    val r = run(Eq("n", "1"), Eq("j", "foo"))
    assert(r.size == 10 && r.forall(_("j") == "foo"))
  }

  test("n=1, j!=foo includes only bar (j always set when n=1)") {
    val r = run(Eq("n", "1"), neq("j", "foo"))
    assert(r.size == 10 && r.forall(_("j") == "bar"))
  }

  test("i=~'.*' matches everything including absent i") {
    assert(run(Re("i", ".*")).size == fixture.size)
  }

  test("i=~'.+' excludes series without i") {
    val r = run(Re("i", ".+"))
    assert(r.size == fixture.size - 1 && r.forall(_.contains("i")))
  }

  test("i=~'' selects only series without i (empty-match semantics)") {
    val r = run(Re("i", ""))
    assert(r == Set(Map("n" -> "9")))
  }

  test("i!='' selects series with i set") {
    assert(run(neq("i", "")).size == fixture.size - 1)
  }

  test("i='' selects series without i") {
    assert(run(Eq("i", "")) == Set(Map("n" -> "9")))
  }

  test("n=1, i=~'1.+', j=foo") {
    val r = run(Eq("n", "1"), Re("i", "1.+"), Eq("j", "foo"))
    assert(r.isEmpty) // i is single digit 0..9; 1.+ needs 2+ chars
  }

  test("n=1, i=~'.+', i!~'2.*', j=foo") {
    val r = run(Eq("n", "1"), Re("i", ".+"), notRe("i", "2.*"), Eq("j", "foo"))
    assert(r.size == 9 && !r.exists(_("i") == "2"))
  }

  // db_test.go:1165 TestNotMatcherSelectsLabelsUnsetSeries
  val unset: Seq[Map[String, String]] = Seq(
    Map("a" -> "abcd", "b" -> "abcde"),
    Map("labelname" -> "labelvalue"))

  def runU(ms: Matcher*): Set[Map[String, String]] =
    unset.filter(l => ms.forall(_.matches(l))).toSet

  test("negation over an unset label matches (db_test.go:1165)") {
    assert(runU(neq("lname", "lvalue")) == unset.toSet)
    assert(runU(Eq("a", "abcd"), neq("b", "abc")) == Set(unset.head))
    assert(runU(notRe("a", "abc.*")) == Set(unset(1)))
    assert(runU(notRe("c", "abd.*")) == unset.toSet)
  }

  test("regex is fully anchored (PromQL convention)") {
    assert(!Re("x", "bc").matchesValue("abcd"))
    assert(Re("x", "a.*d").matchesValue("abcd"))
  }

  test("set-regex detection (querier.go:284-324)") {
    assert(Matcher.setMatches("a|b|c").contains(Seq("a", "b", "c")))
    assert(Matcher.setMatches("^(?:a|b)$").contains(Seq("a", "b")))
    assert(Matcher.setMatches("a.*|b").isEmpty)
    assert(Matcher.setMatches("").isEmpty)
  }

  test("set-regex escape handling (TestFindSetMatches querier_test.go:1775)") {
    // simple sets
    assert(Matcher.setMatches("^(?:foo|bar|baz)$")
      .contains(Seq("foo", "bar", "baz")))
    // escaped metas unescape to their literal
    assert(Matcher.setMatches("^(?:fo\\.o|bar\\?|\\^baz)$")
      .contains(Seq("fo.o", "bar?", "^baz")))
    // unescaped metas bail
    assert(Matcher.setMatches("^(?:fo.o|bar?|^baz)$").isEmpty)
    // escaped letters could be character classes — bail
    assert(Matcher.setMatches("a\\db").isEmpty)
    // escaped backslash is a literal backslash
    assert(Matcher.setMatches("a\\\\b|c").contains(Seq("a\\b", "c")))
    // trailing dangling escape bails
    assert(Matcher.setMatches("abc\\").isEmpty)
    // empty alternatives are dropped (the reference's builder-skip);
    // the compiled predicate restores empty-match via matchesValue("")
    assert(Matcher.setMatches("a||b").contains(Seq("a", "b")))
    assert(Matcher.setMatches("|").isEmpty)
    // any non-meta byte is literal: slash, comma, unicode
    assert(Matcher.setMatches("foo/bar|b,c|ünïcode")
      .contains(Seq("foo/bar", "b,c", "ünïcode")))
    // divergence pinned: bare alternation qualifies here (our Re
    // anchors at compile time; the reference requires its wrapper)
    assert(Matcher.setMatches("foo|bar|baz")
      .contains(Seq("foo", "bar", "baz")))
  }

  test("labels-object matching uses empty-string for absent") {
    assert(Eq("q", "").matches(Labels("a" -> "1")))
  }
}
