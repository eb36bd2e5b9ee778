"""Property: the per-cell grouped GEMM pair kernel equals a brute-force
pairwise reference on arbitrary cell populations — including DUPLICATE
ids (the at-least-once redelivery shape the r13 ADVICE fix covers),
multiple cells, is_new gating, and the emit_cos multiset contract.

The example-based tests pin the known shapes; this drives the kernel's
whole input space: the reference enumerates every row pair per cell and
keeps (id_a < id_b BY VALUE, cosine >= threshold, and — when gated —
at least one new row), one emitted pair PER ROW PAIR (copies multiply;
upstream max-cos dedup collapses them). Near-threshold examples are
discarded (assume) so BLAS blocking vs per-pair accumulation can't flip
a boundary comparison.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
    grouped_cell_pairs,
)

DIM = 4
THR = 0.9

# small integer grids make duplicate/near-dup vectors likely while
# keeping cosines well-separated from the threshold for most draws
_vec = st.lists(st.integers(min_value=-2, max_value=2), min_size=DIM, max_size=DIM)
_row = st.tuples(
    st.integers(min_value=0, max_value=5),   # vec_id (small range → dups)
    _vec,
    st.integers(min_value=0, max_value=1),   # cid (2 cells)
    st.booleans(),                            # is_new
)
_rows = st.lists(_row, min_size=1, max_size=10)


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    na = na if na else 1.0
    nb = nb if nb else 1.0
    return float(np.dot(np.asarray(a, float) / na, np.asarray(b, float) / nb))


def _reference(rows, gated):
    """Expected (doc_a, doc_b, round(cos, 6)) multiset, one per row pair."""
    out = []
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r[2], []).append(r)
    for cell in by_cell.values():
        for i in range(len(cell)):
            for j in range(len(cell)):
                ia, ib = cell[i], cell[j]
                if ia[0] >= ib[0]:  # strict by id VALUE — dups never pair
                    continue
                c = _cos(ia[1], ib[1])
                if c < THR:
                    continue
                if gated and not (ia[3] or ib[3]):
                    continue
                out.append((ia[0], ib[0], round(c, 6)))
    return sorted(out)


@pytest.mark.parametrize("gated", [False, True])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_rows)
def test_grouped_cell_pairs_matches_bruteforce(spark, gated, rows):
    # keep every pair's cosine decisively off the threshold so the
    # kernel's blocked GEMM and the reference's per-pair dot can't
    # disagree on a last-ulp boundary
    for cell in {r[2] for r in rows}:
        cr = [r for r in rows if r[2] == cell]
        for i in range(len(cr)):
            for j in range(i + 1, len(cr)):
                assume(abs(_cos(cr[i][1], cr[j][1]) - THR) > 1e-6)

    df = spark.createDataFrame(
        [(i, [float(x) for x in v], c, n) for (i, v, c, n) in rows],
        "vec_id long, embedding array<float>, cid int, is_new boolean",
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["cos"], 6))
        for r in grouped_cell_pairs(
            df, THR, new_col="is_new" if gated else None, emit_cos=True
        ).collect()
    )
    assert got == _reference(rows, gated)
