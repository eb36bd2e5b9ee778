"""Retrieval operators: BM25 ranking against a hand-computed Python
reference, inverted-index posting contracts, blocked fuzzy matching
recall/precision on planted typos, and the 100 TB plan gates (broadcast
sides, no cartesian, text never shuffles)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import retrieval as RT


def _py_bm25(docs: dict[int, str], query, k1=RT.BM25_K1, b=RT.BM25_B):
    toks = {i: [w for w in re.split(r"\s+", t) if w] for i, t in docs.items()}
    toks = {i: ws for i, ws in toks.items() if ws}
    n = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    scores = {}
    for term in query:
        df = sum(1 for ws in toks.values() if term in ws)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, ws in toks.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            c = round(
                idf * tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * (len(ws) / avgdl))),
                9,
            )
            scores[i] = round(scores.get(i, 0.0) + c, 9)
    return scores


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_bm25_matches_python_reference(spark, tmp_path):
    docs = {
        0: "join hash join vector table scan",
        1: "slow slow slow join",
        2: "row batch merge filter column",
        3: "vector",
        4: "join " * 30,          # long doc: length normalization bites
        5: "",                    # empty doc: excluded from N and avgdl
    }
    d = _write_docs(spark, tmp_path, list(docs.items()))
    got = {
        r["doc_id"]: r["bm25"] for r in RT.doc_bm25_topk(spark, d).collect()
    }
    want = _py_bm25(docs, RT.BM25_QUERY)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9), (i, got[i], want[i])


def test_bm25_ranking_prefers_rare_terms_and_penalizes_length(spark, tmp_path):
    # 'vector' appears in 1 of 40 docs → its doc must outrank a doc
    # with the same tf of the common term 'join' (present everywhere).
    rows = [(i, "join filler text here") for i in range(39)]
    rows.append((39, "vector filler text here"))
    d = _write_docs(spark, tmp_path, rows)
    top = RT.doc_bm25_topk(spark, d).collect()
    assert top[0]["doc_id"] == 39


def test_inverted_index_postings_order_and_bounds(spark, tmp_path):
    # term 'x' in 120 docs (tf = doc_id % 5 + 1): postings must be the
    # 10 highest-tf docs, tf desc then doc_id asc, and df exact.
    rows = [(i, " ".join(["x"] * (i % 5 + 1))) for i in range(120)]
    d = _write_docs(spark, tmp_path, rows)
    out = RT.doc_inverted_index(spark, d).collect()
    assert len(out) == 1 and out[0]["word"] == "x"
    assert out[0]["n_docs"] == 120
    assert out[0]["total_tf"] == sum(i % 5 + 1 for i in range(120))
    # tf=5 ⇔ doc_id % 5 == 4 → lowest ten such ids (house CSV render)
    assert out[0]["postings_csv"] == "4,9,14,19,24,29,34,39,44,49"


def test_inverted_index_min_df_threshold(spark, tmp_path):
    rows = [(i, "common") for i in range(RT.INDEX_MIN_DF)]
    rows += [(1000 + i, "rare") for i in range(RT.INDEX_MIN_DF - 1)]
    d = _write_docs(spark, tmp_path, rows)
    words = {r["word"] for r in RT.doc_inverted_index(spark, d).collect()}
    assert words == {"common"}


def test_fuzzy_pairs_planted_typos(spark, tmp_path):
    names = [
        "acme widget", "acme wigdet",   # transposition, dist 2, same block
        "acme bolt",                    # dist > 3 from widget
        "zenith gear", "zenith gears",  # suffix insert, dist 1
        "zzz gear",                     # same-ish name, different block →
                                        # unreachable by design (blocking)
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "p_partkey long, p_name string"
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in RT.part_fuzzy_pairs(spark, d).collect()
    }
    assert got[("acme widget", "acme wigdet")] == 2
    assert got[("zenith gear", "zenith gears")] == 1
    assert ("acme bolt", "acme widget") not in got
    # blocking contract: cross-block near-match is NOT found
    assert all("zzz gear" not in pair for pair in got)


def test_hybrid_rrf_fuses_both_rankers(spark, tmp_path):
    """A doc ranked #1 by BOTH rankers must out-fuse docs that top only
    one list; single-list docs still appear with one contribution."""
    import math

    # doc 1: contains all BM25 query terms AND its embedding equals the
    # query vector (vec 0) — top of both lists. doc 2: lexical only.
    # doc 3: semantic only. docs 4+: filler.
    docs = [
        (0, "filler text zero"),
        (1, "join hash vector slow"),
        (2, "join join hash hash vector slow slow"),
        (3, "nothing lexical here"),
    ] + [(i, f"plain filler {i}") for i in range(4, 20)]
    base = [1.0] + [0.0] * 15
    orth = [0.0, 1.0] + [0.0] * 14
    embs = [(0, [float(x) for x in base], 0),
            (1, [float(x) for x in base], 0),       # cos 1.0 with query
            (2, [float(x) for x in orth], 1),       # cos 0
            (3, [float(x * 0.9 + y * 0.1) for x, y in zip(base, orth)], 0)]
    embs += [(i, [float(x) for x in orth], 1) for i in range(4, 20)]
    d = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    out = RT.doc_hybrid_rrf(spark, d).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert out[0]["doc_id"] == 1  # top of both lists wins the fusion
    assert by_id[1]["r_lex"] is not None and by_id[1]["r_sem"] is not None
    # doc 3 has no query terms → absent from the lexical list (the
    # semantic list holds every vector here since pool > corpus):
    # exactly one contribution
    assert by_id[3]["r_lex"] is None
    assert by_id[3]["rrf"] == round(1.0 / (RT.RRF_K0 + by_id[3]["r_sem"]), 9)
    # the fused score really is the sum of both reciprocal ranks
    want1 = 1.0 / (RT.RRF_K0 + by_id[1]["r_lex"]) + 1.0 / (
        RT.RRF_K0 + by_id[1]["r_sem"]
    )
    assert by_id[1]["rrf"] == round(want1, 9)
    assert not math.isnan(want1)


def test_retrieval_eval_metrics_hand_computed(spark, tmp_path):
    """MRR / P@10 / nDCG@10 against a corpus engineered so the rank
    list is known: ranks follow cosine to the query direction, and
    relevance (label match) is planted at known positions."""
    import math

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)

    def mix(theta):  # unit vector at angle theta from base in dims 0-1
        return [math.cos(theta), math.sin(theta)] + [0.0] * (dim - 2)

    # query vec 0 (label 0). Ranks by decreasing cosine: vec 1 (rel),
    # vec 2 (irrel), vec 3 (rel), then 4..9 irrelevant tail.
    rows = [(0, base, 0), (1, mix(0.1), 0), (2, mix(0.2), 1),
            (3, mix(0.3), 0), (4, mix(0.4), 1), (5, mix(0.5), 1),
            (6, mix(0.6), 1), (7, mix(0.7), 1), (8, mix(0.8), 1),
            (9, mix(0.9), 1)]
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")
    [r] = RT.retrieval_eval_metrics(spark, d).collect()
    assert r["n_relevant_total"] == 2        # vecs 1 and 3
    assert r["n_relevant_in_pool"] == 2
    assert r["mrr"] == 1.0                   # first hit at rank 1
    assert r["precision_at_10"] == round(2 / 10, 6)
    # DCG = 1/log2(2) + 1/log2(4); IDCG (2 relevant) = 1/log2(2) + 1/log2(3)
    dcg = round(1 / math.log2(2), 9) + round(1 / math.log2(4), 9)
    idcg = round(1 / math.log2(2), 9) + round(1 / math.log2(3), 9)
    assert r["ndcg_at_10"] == round(dcg / idcg, 6)


def _write_parts(spark, tmp_path, names):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "p_partkey long, p_name string"
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    return d


def test_fuzzy_hot_block_escalates_to_deep_prefix(spark, tmp_path):
    """A shallow block over FUZZY_MAX_BLOCK re-keys on the deep prefix:
    pairs sharing the 12-char prefix survive, pairs differing inside it
    are the documented recall loss."""
    # 1100 'pro…' names, deep-distinct → oversize shallow block
    names = [f"pro{i:04d} widget" for i in range(1100)]
    names += ["product alpha x", "product alpha y"]  # share deep prefix, dist 1
    names += ["proXY thing", "proZW thing"]  # dist 2 but deep-divergent
    d = _write_parts(spark, tmp_path, names)
    got = {
        (r["name_a"], r["name_b"])
        for r in RT.part_fuzzy_pairs(spark, d).collect()
    }
    assert ("product alpha x", "product alpha y") in got
    assert ("proXY thing", "proZW thing") not in got  # recall trade
    # the deep-distinct filler can only pair within its own deep block
    assert all(a[:12] == b[:12] for a, b in got)


def test_fuzzy_oversize_deep_block_is_dropped(spark, tmp_path):
    """Deep blocks still over the cap are dropped outright — the hard
    O(cap²) ceiling (same contract as LSH max_bucket_size)."""
    names = [f"product alpha {i:04d}" for i in range(1100)]  # one deep block
    d = _write_parts(spark, tmp_path, names)
    assert RT.part_fuzzy_pairs(spark, d).count() == 0


def test_fuzzy_join_is_keyed_not_cartesian(spark, sf_dir):
    """The block prefix must surface as an equi-join key: no
    CartesianProduct / BroadcastNestedLoopJoin in the plan."""
    plan = (
        RT.part_fuzzy_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_bm25_broadcasts_scalars_and_df(spark, sf_dir):
    """The df table and N/avgdl scalars must be broadcast — the only
    sized exchange is the tf⋈dl doc_id join."""
    plan = (
        RT.doc_bm25_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_on_real_corpus_is_stable(spark, sf_dir):
    rows = RT.doc_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= RT.BM25_TOPK
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


# --- entity resolution composition -------------------------------------------


def test_part_entity_resolution_contract(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.retrieval import (
        part_entity_resolution,
        part_fuzzy_pairs,
    )

    rows = part_entity_resolution(spark, sf_dir).collect()
    names_in_pairs = set()
    for r in part_fuzzy_pairs(spark, sf_dir).collect():
        names_in_pairs.add(r["name_a"])
        names_in_pairs.add(r["name_b"])
    if not names_in_pairs:
        assert rows == []
        return
    # every resolved entity has >= 2 member names (components come
    # from pairs), the entity id is a member name, and the canonical
    # name is at least as long as the entity id
    assert rows
    total_names = 0
    for r in rows:
        assert r["n_names"] >= 2
        assert r["entity_id"] in names_in_pairs
        assert len(r["canonical_name"]) >= len(r["entity_id"])
        assert r["n_parts"] >= r["n_names"]
        total_names += r["n_names"]
    # partition property: every paired name lands in exactly one entity
    assert total_names == len(names_in_pairs)
