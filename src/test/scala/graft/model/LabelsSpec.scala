package graft.model

import org.scalatest.funsuite.AnyFunSuite

class LabelsSpec extends AnyFunSuite {

  test("labels sort by name and drop empty values (labels.go:35-41,106-121)") {
    val l = Labels("b" -> "2", "a" -> "1", "c" -> "", "d" -> "4")
    assert(l.sorted.map(_.name) == Vector("a", "b", "d"))
    assert(l.canonical == """{a="1",b="2",d="4"}""")
  }

  test("absent label reads as empty string") {
    assert(Labels("a" -> "1").get("zzz") == "")
  }

  test("compare: lexicographic over (name,value), shorter-first on prefix (labels.go:164-182)") {
    val ab = Labels("a" -> "1", "b" -> "2")
    val ab2 = Labels("a" -> "1", "b" -> "3")
    val a = Labels("a" -> "1")
    val ac = Labels("a" -> "1", "c" -> "0")
    assert(Labels.compare(ab, ab2) < 0)
    assert(Labels.compare(a, ab) < 0) // prefix, shorter first
    assert(Labels.compare(ab, ac) < 0) // b < c
    assert(Labels.compare(ab, ab) == 0)
  }

  test("compare: the TestCompareAndEquals table (labels_test.go:26-88)") {
    // the reference table's empty-string values become "v": our
    // constructor enforces the append-time empty-drop invariant the
    // reference applies later, and Compare treats any equal values alike
    val cases: Seq[(Labels, Labels, Int)] = Seq(
      (Labels.empty, Labels.empty, 0),
      (Labels("a" -> "v"), Labels("a" -> "v", "b" -> "v"), -1),
      (Labels("a" -> "v"), Labels("a" -> "v"), 0),
      (Labels("aa" -> "v"), Labels("ab" -> "v"), -1),
      (Labels("aa" -> "v", "abb" -> "v"), Labels("aa" -> "v", "ab" -> "v"), 1),
      (Labels("__name__" -> "go_gc_duration_seconds",
        "job" -> "prometheus", "quantile" -> "0.75"),
        Labels("__name__" -> "go_gc_duration_seconds",
          "job" -> "prometheus", "quantile" -> "1"), -1),
      (Labels("handler" -> "prometheus", "instance" -> "localhost:9090"),
        Labels("handler" -> "query", "instance" -> "localhost:9090"), -1))
    for (((a, b, res), i) <- cases.zipWithIndex) {
      assert(Integer.signum(Labels.compare(a, b)) == res, s"case $i")
      assert(Integer.signum(Labels.compare(b, a)) == -res, s"case $i rev")
      assert((Labels.compare(a, b) == 0) == (a == b), s"case $i equals")
    }
  }

  test("canonical-string order agrees with compare except digit-suffix " +
    "names (the O1/O2 sort divergence, documented)") {
    // same-length name/value mismatches sort the same under
    // canonical-string order...
    assert(Labels("aa" -> "v").canonical < Labels("ab" -> "v").canonical)
    assert(Labels("a" -> "1", "b" -> "2").canonical <
      Labels("a" -> "1", "b" -> "3").canonical)
    // ...two valid-charset exceptions, pinned as deliberate divergences
    // (outputs sorted by series_key use string order — a total order
    // either way):
    // 1. a digit after a shared name prefix sorts below the canonical
    //    form's `=` (0x30-0x39 < 0x3D): {a1=...} < {a=...} by string,
    //    while name-compare says "a" < "a1"
    assert(Labels.compare(Labels("a" -> "v"), Labels("a1" -> "v")) < 0)
    assert(Labels("a1" -> "v").canonical < Labels("a" -> "v").canonical)
    // 2. the closing `}` (0x7D) sorts above `,` (0x2C): a label-set
    //    prefix follows its supersets by string, while set-compare puts
    //    the shorter set first
    assert(Labels.compare(Labels("a" -> "v"), Labels("a" -> "v", "b" -> "v")) < 0)
    assert(Labels("a" -> "v", "b" -> "v").canonical < Labels("a" -> "v").canonical)
  }

  test("hash is deterministic and insensitive to construction order") {
    val h1 = Labels("x" -> "1", "y" -> "2").hash
    val h2 = Labels("y" -> "2", "x" -> "1").hash
    assert(h1 == h2)
    assert(h1 != Labels("x" -> "1", "y" -> "3").hash)
  }

  test("hash separates (ab,c) from (a,bc) via \\xff separators (labels.go:61-71)") {
    assert(Labels("ab" -> "c").hash != Labels("a" -> "bc").hash)
  }
}

class XXHash64Spec extends AnyFunSuite {
  // Reference vectors from the public xxHash spec/implementations.
  test("xxh64 known vectors") {
    assert(XXHash64.hash(Array.emptyByteArray, 0L) == 0xef46db3751d8e999L)
    assert(XXHash64.hash("a".getBytes("UTF-8"), 0L) == 0xd24ec4f1a98c6e5bL)
    assert(XXHash64.hash("abc".getBytes("UTF-8"), 0L) == 0x44bc2cf5ad770999L)
    // >32 bytes exercises the 4-lane stripe loop
    val s = "xxhash64 is a fast non-cryptographic hash algorithm!!"
    assert(XXHash64.hash(s.getBytes("UTF-8"), 0L) != 0L)
  }
}
