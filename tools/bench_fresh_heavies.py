"""Fresh-JVM bench leg for the six heavy extension entries.

VERDICT r11 item 5: the in-bench extension walls are position-
consistent round over round (append-only list) but each includes
in-JVM profile aging from everything before it — the r11 adjudication
showed the r9→r10 "+17% drift" was exactly that. This tool gives each
heavy its OWN JVM: one subprocess per entry, warm rep + min-of-N with
persisted RDDs released between reps (bench.py's timed_reps protocol),
bracketed by min-of-3 canaries. These numbers are absolutely
comparable across rounds (no position effect); BASELINE.md carries
them alongside the aged-JVM leg.

Usage: python tools/bench_fresh_heavies.py [--reps 3] [sf_dir]
Prints one JSON line: {"metric": "fresh_heavies", "queries": {...},
"canaries": {...}, "reps": N, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEAVIES = [
    "part_triangle_stats",
    "ann_recall_report",
    "nation_pagerank",
    "part_entity_resolution",
    "order_basket_rules",
    "doc_bigram_logprob",
]

# parameterized via env vars — the body holds JSON braces that
# str.format would misparse as placeholders
_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["FRESH_REPO"])
import __spark_entry__ as entrymod
from bench import canary_probe, force, timed_reps
from cloudfront_kinesis_log_lambda_spark.session import get_spark

name = os.environ["FRESH_NAME"]
sf_dir = os.environ["FRESH_SF_DIR"]
reps = int(os.environ["FRESH_REPS"])
# the SAME master derivation as bench.py's aged-JVM leg (bench.py:404)
# — a hardcoded local[32] would compare the legs at different core
# counts whenever SPARK_GRAFT_CPUS is set (ADVICE r12)
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="fresh-" + name, master="local[" + cpus + "]")
fn = entrymod.queries()[name]
canary_probe(spark)  # pay canary codegen before the bracket reading
c_before = canary_probe(spark)
rs = timed_reps(spark, fn, sf_dir, reps)
c_after = canary_probe(spark)
print("CHILD " + json.dumps({
    "name": name,
    "min": round(min(rs), 3),
    "reps": [round(r, 3) for r in rs],
    "canary_before": round(c_before, 3),
    "canary_after": round(c_after, 3),
}))
"""


def main() -> None:
    reps, positional = 3, []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            positional.append(a)
    sf_dir = positional[0] if positional else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    queries: dict[str, float] = {}
    canaries: dict[str, list[float]] = {}
    failed: list[str] = []
    for name in HEAVIES:
        env = dict(
            os.environ,
            FRESH_REPO=REPO,
            FRESH_NAME=name,
            FRESH_SF_DIR=sf_dir,
            FRESH_REPS=str(reps),
        )
        try:
            # generous hard deadline — a hung child JVM must not wedge
            # the whole leg (ADVICE r12); the slowest heavy measures ~5 s
            # per rep, so 15 min covers any plausible ambient load
            out = subprocess.run(
                [sys.executable, "-c", _CHILD],
                capture_output=True,
                text=True,
                cwd=REPO,
                env=env,
                timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"# {name}: child timed out (900s)", file=sys.stderr)
            failed.append(name)
            continue
        line = next(
            (ln for ln in out.stdout.splitlines() if ln.startswith("CHILD ")),
            None,
        )
        if line is None:
            print(f"# {name}: child failed\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            # out-of-band failure report — a -1.0 in "queries" reads as a
            # negative wall to naive trend tooling (ADVICE r12)
            failed.append(name)
            continue
        rec = json.loads(line[len("CHILD "):])
        queries[name] = rec["min"]
        canaries[name] = [rec["canary_before"], rec["canary_after"]]
        print(f"# {name}: min {rec['min']}s (reps {rec['reps']}, "
              f"canaries {canaries[name]})", file=sys.stderr)
    # r15 (VERDICT r14 item 6): in-band floor_units — min ÷ adjacent
    # canary-min, per heavy, IN the artifact line. The fresh-JVM anchor
    # adjudications previously leaned on prose canary brackets in
    # BASELINE.md; this is the same box-independent mechanism the
    # headline floor queries got in r14 (bench.py contract line).
    floor_units = {
        n: round(queries[n] / min(canaries[n]), 1)
        for n in queries
        if min(canaries[n]) > 0
    }
    print(json.dumps({
        "metric": "fresh_heavies",
        "queries": queries,
        "floor_units": floor_units,
        "canaries": canaries,
        "failed": failed,
        "reps": reps,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
