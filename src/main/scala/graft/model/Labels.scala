package graft.model

/** Label-set model mirroring the reference's semantics:
  *   - a series is identified by a sorted set of (name, value) string
  *     pairs (reference `labels/labels.go:35-41`);
  *   - an empty label value is equivalent to the label being absent
  *     (`labels/labels.go:106-121`, stripped on append `head.go:832-833`);
  *   - identity hash = xxhash64(seed 0) over `name \xff value \xff ...`
  *     (`labels/labels.go:61-71`);
  *   - ordering is lexicographic over the flattened (name, value)
  *     sequence, shorter set first on common prefix
  *     (`labels/labels.go:164-182`).
  *
  * Pure Scala (no Spark) so unit tests and driver-side tools can use it.
  * The DataFrame equivalents live in [[graft.functions]].
  */
final case class Label(name: String, value: String)

final case class Labels private (sorted: Vector[Label]) {
  def get(name: String): String =
    sorted.find(_.name == name).map(_.value).getOrElse("")

  def toMap: Map[String, String] = sorted.map(l => l.name -> l.value).toMap

  /** Canonical rendering `{k="v",k2="v2"}` (reference `labels/labels.go:43-58`). */
  def canonical: String =
    sorted.map(l => s"""${l.name}="${l.value}"""").mkString("{", ",", "}")

  /** Identity hash: xxhash64(seed 0) over `name\xff value\xff ...`
    * (reference `labels/labels.go:61-71`). */
  def hash: Long = {
    val bb = new java.io.ByteArrayOutputStream(64)
    sorted.foreach { l =>
      bb.write(l.name.getBytes("UTF-8")); bb.write(0xff)
      bb.write(l.value.getBytes("UTF-8")); bb.write(0xff)
    }
    XXHash64.hash(bb.toByteArray, 0L)
  }
}

object Labels {
  val empty: Labels = new Labels(Vector.empty)

  /** Sorts by name and drops empty-valued labels — the two invariants the
    * reference enforces at construction/append time. */
  def apply(pairs: (String, String)*): Labels = fromMap(pairs.toMap)

  def fromMap(m: Map[String, String]): Labels =
    new Labels(
      m.iterator
        .filter { case (_, v) => v != null && v.nonEmpty }
        .map { case (k, v) => Label(k, v) }
        .toVector
        .sortBy(_.name))

  /** Lexicographic compare over flattened (name, value) pairs; on a common
    * prefix the shorter set sorts first (reference `labels/labels.go:164-182`). */
  def compare(a: Labels, b: Labels): Int = {
    val n = math.min(a.sorted.length, b.sorted.length)
    var i = 0
    while (i < n) {
      val la = a.sorted(i); val lb = b.sorted(i)
      val cn = la.name.compareTo(lb.name)
      if (cn != 0) return cn
      val cv = la.value.compareTo(lb.value)
      if (cv != 0) return cv
      i += 1
    }
    a.sorted.length - b.sorted.length
  }
}
