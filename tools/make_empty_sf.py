"""Build a 0-row scale dir with the production schemas — the input for
the empty-table differential sweep (r13):

    python tools/make_empty_sf.py [src_sf_dir] [dst_dir]
    python tools/check_correctness.py /tmp/sf-empty

Empty slices are routine at scale (a day with no events, a filter that
drains a partition, a split with no documents); the sweep checks every
registry entry degrades to an empty frame / the documented contract
error, never to an analysis-time type error or an unreadable store.
Expected-fail classes are documented in BASELINE.md's r13 close (the
rows-only 0-rows flags, the kmeans/query contract errors, and the
pinned Spark-vs-standard grouping-sets divergence).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf-empty"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}),
            f"{dst}/{t}.parquet",
        )
    print(f"wrote 10 empty tables to {dst}")


if __name__ == "__main__":
    main()
