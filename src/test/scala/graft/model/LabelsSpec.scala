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
