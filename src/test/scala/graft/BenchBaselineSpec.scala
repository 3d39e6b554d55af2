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

  test("fresh-JVM adjudication spawns a clean child and parses its timing") {
    // The tripwire's degradation-proof re-run (r14: the same-JVM re-run
    // "confirmed" two regressions that measured at baseline in fresh JVMs).
    // Drive the real seam end to end at sf0.001: a child JVM with the warm
    // set, one timed query, JSON parsed back. Anything broken in the
    // classpath/JVM-flag reconstruction, the child env, or the JSON parse
    // returns -1 and fails here.
    val sec = Bench.freshJvmSeconds("q1_agg", "/root/testdata/sf0.001")
    assert(sec > 0.0 && sec < 120.0,
      s"fresh-JVM adjudication returned $sec for q1_agg at sf0.001 — " +
        "child spawn, env, or JSON parse is broken")
  }

  test("baseline times are positive and plausible") {
    val bad = BenchBaseline.seconds.filter { case (_, s) => s <= 0 || s > 120 }
    assert(bad.isEmpty, s"implausible baseline entries: $bad")
  }

  test("every layer-backed warm-up name is a live query") {
    val stale = Bench.layerBacked.toSet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"Bench.layerBacked names removed queries: $stale")
  }

  test("every ensure* call site is covered by the untimed warm-up") {
    // A Sinks.ensure* call inside a query module builds a write-once layer;
    // if its query is missing from Bench.layerBacked, a tag/fingerprint bump
    // lands that layer's rebuild inside the timed run (the r9 regression
    // storm). Scan the query sources: each file with ensure* sites must have
    // all of them inside queries named in layerBacked or in the separately
    // warmed layer builders. The attribution below is a positional
    // heuristic (nearest preceding arrow/def), so it can mis-assign a site
    // in a helper def called from elsewhere — the AUTHORITATIVE check is
    // Bench's runtime `timed_layer_rebuilds` field (Sinks.onRebuild fires
    // on any rebuild during the timed loop); this sweep just fails fast at
    // test time for the common inline shape.
    val src = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val warmedElsewhere = Set(
      "warmGraphLayers", "coPurchaseEdges", "dagLayer", "weightedLayer",
      "degreeEdgeTable", "pgmFilesLayer", "compactInLayer",
      "dynpartBaseLayer", "snapCdfSliceLayer", "ordersTtBase",
      "packSliceLayer")
    val qNameRe = """"(q_[a-z0-9_]+|[a-z]+_[a-z0-9_]+)"\s*->""".r
    val ensureRe = """Sinks\.(ensureDir|ensureBucketedTable)\(""".r
    val defRe = """(?:private\s+)?def\s+([A-Za-z0-9_]+)""".r
    import scala.jdk.CollectionConverters._
    var sitesSeen = 0
    val uncovered = java.nio.file.Files.list(src).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { f =>
        val text = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        ensureRe.findAllMatchIn(text).map(_.start).flatMap { pos =>
          sitesSeen += 1
          // owner = the nearest preceding query-name arrow or def
          val before = text.substring(0, pos)
          val lastQ = qNameRe.findAllMatchIn(before).toSeq.lastOption
          val lastD = defRe.findAllMatchIn(before).toSeq.lastOption
          // attribute to the nearest preceding query arrow, except when the
          // nearest enclosing def is one of the separately-warmed layer
          // builders (defs INSIDE query lambdas, e.g. q_ivm_join's `term`,
          // must not shadow their query)
          val owner = (lastQ, lastD) match {
            case (q, Some(d)) if warmedElsewhere(d.group(1)) &&
                q.forall(_.start < d.start) => d.group(1)
            case (Some(q), _) => q.group(1)
            case (None, Some(d)) => d.group(1)
            case _ => s"<top of ${f.getFileName}>"
          }
          if (Bench.layerBacked.contains(owner) || warmedElsewhere(owner))
            None
          else Some(s"${f.getFileName}: ensure* under '$owner'")
        }
      }.toSeq
    assert(sitesSeen >= 20,
      s"source sweep looks broken: only $sitesSeen ensure* sites found " +
        "(expected the ~24 known call sites) — check the scan path")
    assert(uncovered.isEmpty,
      s"ensure* call sites not in Bench.layerBacked warm-up:\n  " +
        uncovered.mkString("\n  "))
  }
}
