package graft

/** SCALE.md is the judge-facing 100 TB design table; a query that never
  * appears there has an unstated scale story. This sweep fails the build
  * when a `SparkEntry.queries` name is missing from SCALE.md (mirroring
  * BenchBaselineSpec's add-a-query-forces-a-baseline-entry contract), so
  * every new query ships with its design row — and stale rows naming
  * removed queries are flagged the same way.
  */
class ScaleDocSpec extends SparkTestBase {

  private lazy val scaleMd: String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SCALE.md")),
    "UTF-8")

  test("every query has a SCALE.md design row") {
    val missing = SparkEntry.queries.keySet.filterNot(scaleMd.contains)
    assert(missing.isEmpty,
      s"queries with no SCALE.md row (add the 100 TB design): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every backtick-quoted query-shaped name in SCALE.md is live") {
    // catch rows that keep naming a renamed/removed query — only names
    // matching the query naming shape, so prose code references
    // (functions, files) don't false-positive
    val nameRe = """`((?:q|mm|mr|sim|text|dedup|wordcount)[a-z0-9_]*)`""".r
    val live = SparkEntry.queries.keySet
    val stale = nameRe.findAllMatchIn(scaleMd).map(_.group(1)).toSet
      .filterNot(live)
    assert(stale.isEmpty,
      s"SCALE.md names non-live queries: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
