package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** String dir-bounds must compare in UTF-8 byte order — the order Spark's
  * UTF8String used when it computed the stored min/max. Java String
  * ordering (UTF-16 code units) disagrees for supplementary-plane
  * characters: their UTF-16 surrogates (0xD800–0xDFFF) sort BELOW U+E000,
  * while their 4-byte UTF-8 encoding sorts ABOVE every 3-byte BMP char —
  * comparing with String `<` could wrongly prune a dir holding matches. */
class BoundsOrderSpec extends AnyFunSuite {
  private val bmp = "" // U+F8FF: 3-byte UTF-8, high BMP
  private val supp = new String(Character.toChars(0x1F600)) // 4-byte UTF-8

  test("utf8Compare orders supplementary-plane above high-BMP chars " +
      "(where UTF-16 code-unit order flips)") {
    // Java String order says supp < bmp (surrogate 0xD83D < 0xF8FF)…
    assert(supp < bmp)
    // …but UTF-8 byte order (what Spark min/max used) says supp > bmp
    assert(SnapshotTable.utf8Compare(supp, bmp) > 0)
    assert(SnapshotTable.utf8Compare(bmp, supp) < 0)
    assert(SnapshotTable.utf8Compare(supp, supp) == 0)
    assert(SnapshotTable.utf8Compare("a", "ab") < 0)
  }

  test("boundsOverlap keeps a dir whose UTF-8 range covers the probe even " +
      "when UTF-16 order would wrongly prune it") {
    // dir holds strings in [bmp, supp] (UTF-8 order: bmp < supp); probing
    // for exactly `supp` must keep it. Under String compare, max(bmp as
    // Java max?) — Spark would have stored min=bmp, max=supp; a String
    // compare sees max=supp < lo=bmp? No: the failing shape is a probe
    // above the Java-order max. Probe lo=hi=supp: String order says
    // max(bmp-as-max-if-java-sorted)… assert directly on both fields.
    assert(SnapshotTable.boundsOverlap("string", bmp, supp, supp, supp))
    // a dir whose true (UTF-8) max is bmp does NOT hold supp — pruned
    assert(!SnapshotTable.boundsOverlap("string", "a", bmp, supp, supp))
    // and the flip side: if the comparison ran in UTF-16 order, a dir
    // with min=supp would wrongly survive a probe for bmp (supp < bmp in
    // UTF-16) — UTF-8 order correctly prunes it
    assert(!SnapshotTable.boundsOverlap("string", supp, supp, bmp, bmp))
  }
}
