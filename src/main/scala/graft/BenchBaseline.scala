package graft

/** The committed per-query bench baseline: sf0.1, local[32], one full run
  * (all warm-ups applied, measured in bench order — see CLAUDE.md on why
  * isolated reruns are not comparable). Loaded from the classpath resource
  * `/graft/bench_baseline.json`, a flat `{"query":seconds}` map produced by
  * `scripts/update_bench_baseline.py` from a full Bench stdout capture.
  *
  * Bench compares each run against this and emits a `"regressions"` object;
  * BenchBaselineSpec keeps the file from rotting as queries are added.
  */
object BenchBaseline {
  private val entry = """"([^"]+)"\s*:\s*([0-9.]+)""".r

  lazy val seconds: Map[String, Double] = {
    val in = getClass.getResourceAsStream("/graft/bench_baseline.json")
    if (in == null) Map.empty
    else {
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      entry.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }
}
