"""Sharded full-tier suite runner (VERDICT r12 item 2).

The full tier crossed the 30-minute round-close trigger (34 m 01 s at
525 tests) with its wall dominated by a few hypothesis property files
over a long flat tail — a shape that parallelizes at FILE granularity
without trimming coverage. This tool partitions tests/test_*.py into N
shards (greedy LPT over measured per-file walls), runs one pytest
subprocess per shard concurrently, and splits the box's cores across
the shard JVMs (CFKLL_TEST_MASTER → tests/conftest.py).

Balance data: every run parses pytest's --durations output and writes
the per-file walls back to tools/suite_durations.json, so shard balance
improves from real measurements; the first run falls back to
size×tier-weight heuristics seeded with the known heavy files.

Usage: python tools/run_suite_sharded.py [--shards 3] [--cpus N]
                                         [-m "not slow"] [extra pytest args]
Prints one JSON line:
  {"metric": "suite_sharded", "wall": s, "passed": n, "failed": n,
   "skipped": n, "errors": n, "shards": [...]}
Exit code 0 iff every shard exited 0 (pytest exit 5 "no tests" counts
as failure — a shard that collected nothing means the partition broke).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DURATIONS_PATH = os.path.join(REPO, "tools", "suite_durations.json")

# r12 round-close --durations head — the heuristic seed for files the
# measured table hasn't covered yet (fresh checkout / renamed file)
_SEED_HEAVY = {
    "test_streaming_neardup_props.py": 180.0,
    "test_streaming_semantic_dedup.py": 120.0,
    "test_transforms.py": 100.0,
    "test_streaming_holt_winters.py": 90.0,
    "test_upsert_props.py": 80.0,
    "test_kinesis_source_props.py": 80.0,
    "test_kinesis_sink_props.py": 70.0,
}


def _weights(files: list[str]) -> dict[str, float]:
    measured: dict[str, float] = {}
    if os.path.exists(DURATIONS_PATH):
        with open(DURATIONS_PATH) as f:
            measured = json.load(f)
    w = {}
    for path in files:
        base = os.path.basename(path)
        if base in measured:
            w[path] = measured[base]
        elif base in _SEED_HEAVY:
            w[path] = _SEED_HEAVY[base]
        else:
            # property/fuzz files run dozens of Spark jobs per example —
            # weight them well above a same-sized example-based file
            tier = 5.0 if base.endswith(("_props.py", "_fuzz.py")) else 1.0
            w[path] = os.path.getsize(path) / 1000.0 * tier
    return w


def _partition(files: list[str], weights: dict[str, float], n: int) -> list[list[str]]:
    """Greedy LPT: heaviest file onto the lightest shard."""
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for path in sorted(files, key=lambda p: -weights[p]):
        i = loads.index(min(loads))
        shards[i].append(path)
        loads[i] += weights[path]
    return [s for s in shards if s]


_SUMMARY_RE = re.compile(r"(\d+) (passed|failed|skipped|error|errors|xfailed|xpassed)")
_DURATION_RE = re.compile(r"^\s*([0-9.]+)s\s+(?:call|setup|teardown)\s+(tests/[^:]+)::")


def _run_shard(idx: int, files: list[str], cpus: int, extra: list[str],
               out: dict, logdir: str) -> None:
    env = dict(os.environ, CFKLL_TEST_MASTER=f"local[{cpus}]")
    logpath = os.path.join(logdir, f"shard{idx}.log")
    t0 = time.monotonic()
    with open(logpath, "w") as log:
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", *files, "-q",
             "--durations=0", "--durations-min=0.05", "-p", "no:cacheprovider",
             *extra],
            stdout=log, stderr=subprocess.STDOUT, cwd=REPO, env=env,
        ).returncode
    wall = round(time.monotonic() - t0, 1)
    counts = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    file_walls: dict[str, float] = {}
    with open(logpath) as f:
        for line in f:
            m = _DURATION_RE.match(line)
            if m:
                base = os.path.basename(m.group(2))
                file_walls[base] = file_walls.get(base, 0.0) + float(m.group(1))
            for num, kind in _SUMMARY_RE.findall(line):
                if kind in ("error", "errors"):
                    kind = "errors"
                elif kind in ("xfailed", "xpassed"):
                    continue
                counts[kind] = int(num)
    out[idx] = {
        "rc": rc,
        "wall": wall,
        "n_files": len(files),
        "log": logpath,
        "file_walls": file_walls,
        **counts,
    }


def main() -> int:
    shards_n, cpus, extra = 3, 0, []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--shards":
            shards_n = int(next(it))
        elif a.startswith("--shards="):
            shards_n = int(a.split("=", 1)[1])
        elif a == "--cpus":
            cpus = int(next(it))
        elif a.startswith("--cpus="):
            cpus = int(a.split("=", 1)[1])
        else:
            extra.append(a)
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    files = [os.path.relpath(p, REPO) for p in files]
    if not cpus:
        # mild oversubscription keeps cores busy while shards sit in
        # Python/driver-side code (roughly half of these tests' wall)
        cpus = max(4, (os.cpu_count() or 8) * 2 // (shards_n + 1))
    weights = _weights(files)
    parts = _partition(files, weights, shards_n)
    logdir = os.path.join(REPO, "tools", ".suite_logs")
    os.makedirs(logdir, exist_ok=True)
    for i, part in enumerate(parts):
        est = round(sum(weights[p] for p in part), 1)
        print(f"# shard {i}: {len(part)} files, est {est}", file=sys.stderr)

    t0 = time.monotonic()
    results: dict[int, dict] = {}
    threads = [
        threading.Thread(target=_run_shard, args=(i, p, cpus, extra, results, logdir))
        for i, p in enumerate(parts)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = round(time.monotonic() - t0, 1)

    # fold measured walls back into the balance table (full runs only —
    # a filtered run like -m "not slow" would understate property files)
    if not any(e == "-m" or e.startswith("-m=") or e.startswith("--markers") for e in extra):
        measured: dict[str, float] = {}
        if os.path.exists(DURATIONS_PATH):
            with open(DURATIONS_PATH) as f:
                measured = json.load(f)
        for rec in results.values():
            measured.update(rec["file_walls"])
        with open(DURATIONS_PATH, "w") as f:
            json.dump(dict(sorted(measured.items())), f, indent=1)

    shard_rows = []
    totals = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    # a shard thread that died before recording its result (e.g. log
    # parse crash) must fail the run — otherwise its tests are silently
    # missing while the runner exits 0 (ADVICE r13)
    ok = len(results) == len(parts)
    if not ok:
        missing = sorted(set(range(len(parts))) - set(results))
        print(f"# FATAL: shard(s) {missing} recorded no result", file=sys.stderr)
    for i in sorted(results):
        rec = results[i]
        ok &= rec["rc"] == 0
        for k in totals:
            totals[k] += rec[k]
        shard_rows.append({k: rec[k] for k in
                           ("rc", "wall", "n_files", "passed", "failed",
                            "skipped", "errors", "log")})
        print(f"# shard {i}: rc={rec['rc']} wall={rec['wall']}s "
              f"passed={rec['passed']} failed={rec['failed']} "
              f"skipped={rec['skipped']} errors={rec['errors']}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "suite_sharded",
        "wall": wall,
        **totals,
        "shards": shard_rows,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
