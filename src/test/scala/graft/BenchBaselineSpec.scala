package graft

/** The bench-regression tripwire only bites if the committed baseline tracks
  * the live query surface — this spec fails the build when the baseline file
  * is missing, empty, or has drifted from SparkEntry.queries (stale names or
  * a growing uncovered set), so "add a query" forces a baseline refresh via
  * scripts/update_bench_baseline.py rather than silently shrinking coverage.
  */
class BenchBaselineSpec extends SparkTestBase {

  test("baseline resource exists and parses to a non-empty map") {
    assert(BenchBaseline.seconds.nonEmpty,
      "src/main/resources/graft/bench_baseline.json missing or empty — " +
        "run scripts/update_bench_baseline.py on a full bench capture")
  }

  test("every baseline entry names a live query") {
    val stale = BenchBaseline.seconds.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"baseline entries for removed queries: $stale")
  }

  test("baseline covers the full query surface") {
    val uncovered = SparkEntry.queries.keySet -- BenchBaseline.seconds.keySet
    assert(uncovered.isEmpty,
      s"queries with no bench baseline (refresh it): $uncovered")
  }

  test("baseline times are positive and plausible") {
    val bad = BenchBaseline.seconds.filter { case (_, s) => s <= 0 || s > 120 }
    assert(bad.isEmpty, s"implausible baseline entries: $bad")
  }
}
