#!/usr/bin/env python3
"""Refresh the committed bench baseline from a full Bench stdout capture.

Usage:
    sbt -batch "runMain graft.Bench" 2>&1 | tee /tmp/bench_full.txt
    python3 scripts/update_bench_baseline.py /tmp/bench_full.txt

Extracts the `"queries"` map from the bench JSON line and writes it to
src/main/resources/graft/bench_baseline.json (flat {"query": seconds}).
"""
import json
import re
import sys

OUT = "src/main/resources/graft/bench_baseline.json"


def main() -> None:
    text = open(sys.argv[1]).read()
    lines = [l for l in text.splitlines() if '"metric"' in l and '"queries"' in l]
    if not lines:
        sys.exit("no bench JSON line found")
    # the JSON line may be wrapped in sbt prefixes; grab from the first brace
    line = lines[-1]
    obj = json.loads(line[line.index("{"):])
    queries = obj["queries"]
    if obj.get("failed"):
        sys.exit(f"refusing to baseline a run with failures: {obj['failed']}")
    with open(OUT, "w") as f:
        json.dump(dict(sorted(queries.items())), f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(queries)} baseline entries to {OUT}")


if __name__ == "__main__":
    main()
