"""Similarity search over embedding columns (SURVEY.md §2.6).

Two tiers:

- **brute-force cosine top-k** — the exact baseline. Dot products via
  ``zip_with``+``aggregate`` higher-order functions; the top-k is
  TakeOrderedAndProject. ~O(N·d) per query — the right answer up to a
  few billion rows when fused with a partition-pruned scan.
- **random-hyperplane LSH ANN** / **IVF** — the scale paths. Candidate
  generation and scoring run as Arrow-batched numpy pandas UDFs
  (matrix multiply per batch, BLAS): measured ~3-5× over the
  higher-order-function formulation, whose per-element lambdas evaluate
  interpreted, and free of the k×dim literal expression trees that
  Janino re-compiles per plan.

Numerics policy: queries with a DuckDB oracle twin (cosine_topk,
cosine_pairs_exact, embedding_norms) keep the JVM sequential-fold dot
product — bit-identical accumulation order to the oracle's, so ROUND(x,4)
comparisons can't flip on last-ulp differences. The ANN paths (rows-only,
recall-gated) use numpy, where pairwise/BLAS accumulation order may
differ in the last ulp — irrelevant for bucketing and top-k recall.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.util import ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _cos_safe(a: Column, b: Column) -> Column:
    """Total cosine: NULL when the denominator is zero instead of an
    ANSI DIVIDE_BY_ZERO crash (r14 hostile-numeric sweep: one all-zero
    vector anywhere in the corpus killed every exact-cosine query —
    and at 100 TB a zero vector somewhere in the keyspace is routine).
    NaN propagates (a NaN-element vector has NaN norm), so callers
    pair this with :func:`_finite_filter`.

    ``try_divide`` rather than ``when(denom > 0, dot/denom)``: same
    semantics on the norm domain (norms are ≥ 0 or NaN; NULL exactly
    at zero, NaN/NaN elsewhere), but the denominator folds evaluate
    ONCE — the conditional form duplicates the O(d) norm folds into
    both the predicate and the value branch, and codegen CSE across
    conditional branches is not guaranteed."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _finite_filter(c: Column) -> Column:
    """The exact-cosine participation contract (r14): only vectors with
    a positive finite norm rank — a zero-norm vector has no direction
    (cosine NULL) and a NaN/Inf-element vector has no meaningful score
    (cosine NaN). Both engines agree NaN sorts greatest, so without
    this filter garbage vectors would deterministically CROWD OUT real
    neighbors from every top-k. Mirrored in the DuckDB oracles."""
    return c.isNotNull() & ~F.isnan(c)


def fetch_query_vec(
    embeddings: DataFrame, id_col: str, vec_col: str, query_vec_id: int
) -> list:
    """Driver-side 1-row fetch of a stored query vector, with a CLEAR
    contract error: the bare `[qrow] = ...collect()` destructuring the
    ANN tiers used raised "not enough values to unpack" on a missing id
    and silently meant "duplicated id" on too many (r13 empty-table
    differential sweep surfaced the former on an empty corpus).

    Public (no underscore) since r14: plans/registry.py shares the fetch
    across ANN tiers, so the error contract is cross-module API."""
    rows = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(vec_col)
        .limit(2)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"query {id_col}={query_vec_id} not found in the corpus "
            "(empty table or unknown id) — pass query_vec= explicitly "
            "or use an id that exists"
        )
    if len(rows) > 1:
        raise ValueError(
            f"query {id_col}={query_vec_id} is duplicated in the corpus "
            "— ids must be unique for a stored-vector query"
        )
    return list(rows[0][0])


def embedding_norms_by_label(embeddings: DataFrame) -> DataFrame:
    """Sanity/statistics operator: mean L2 norm per label — exercises the
    higher-order-function dot product and is SQL-oracle-checkable."""
    return (
        embeddings.select("label", _norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of one stored vector.

    The one-row query side is cross-joined with a broadcast hint — the
    plan is scan → codegen'd cosine → TakeOrderedAndProject; no shuffle.

    Contract note (applies to every exact path built on this broadcast
    shape — matryoshka_topk, cosine_topk_multi, quantized_dot_topk): a
    ``query_vec_id`` absent from the corpus yields an EMPTY result, and
    a duplicated id multiplies the scored rows — deliberately unchecked
    here to keep the single-job plan (a validating count would add a
    scan); validate ids upstream, or use the ANN tiers, whose
    driver-side query collect raises on a missing id.
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    cos = _cos_safe(F.col(vec_col), F.col("q_vec"))
    return (
        ensure_parallelism(embeddings).crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, F.round(cos, 4).alias("cos"))
        .filter(_finite_filter(F.col("cos")))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def matryoshka_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    prefix_dim: int = 16,
    shortlist_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka two-stage serving: shortlist by cosine over the first
    ``prefix_dim`` dimensions (the truncation tier of a
    matryoshka-representation index — 4× less arithmetic and, in a real
    deployment, a 4×-smaller resident index), then re-rank the
    ``k·shortlist_factor`` survivors by full-dimension cosine. The
    coarse-then-exact shape is the same contract as IVF-PQ's ADC +
    re-rank, but with a *prefix slice* as the coarse code, so every
    stage stays exact deterministic arithmetic — unlike the trained ANN
    tiers this path is fully oracle-checkable end to end.

    Returns (vec_id, cos_pref, cos_full), the final top-``k`` by
    (cos_full DESC, vec_id).

    Scale shape: stage 1 is the :func:`cosine_topk` plan — broadcast
    one-row query side, codegen'd fold over the 16-float prefix,
    TakeOrderedAndProject — a map-only scan with no shuffle; stage 2
    touches only ``k·shortlist_factor`` rows, so the full-dimension
    math runs on a constant-sized remnant regardless of corpus size.
    Both orderings tiebreak on ``vec_id`` over ROUND-4 scores, which
    pins shortlist membership (and therefore the final answer) across
    engines.
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    pv = F.slice(F.col(vec_col), 1, prefix_dim)
    pq = F.slice(F.col("q_vec"), 1, prefix_dim)
    cos_pref = _cos_safe(pv, pq)
    cos_full = _cos_safe(F.col(vec_col), F.col("q_vec"))
    shortlist = (
        ensure_parallelism(embeddings)
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            id_col,
            vec_col,
            "q_vec",
            F.round(cos_pref, 4).alias("cos_pref"),
        )
        .filter(_finite_filter(F.col("cos_pref")))
        .orderBy(F.col("cos_pref").desc(), F.col(id_col))
        .limit(k * shortlist_factor)
    )
    return (
        shortlist.select(
            id_col, "cos_pref", F.round(cos_full, 4).alias("cos_full")
        )
        .filter(_finite_filter(F.col("cos_full")))
        .orderBy(F.col("cos_full").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_multi(
    embeddings: DataFrame,
    query_vec_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors at once — the
    serving-throughput pattern: one corpus scan amortized across all
    queries instead of one scan per query.

    The query side (|Q| rows) broadcasts; each corpus row scores against
    every query in the same codegen'd projection; per-query top-k is a
    rank window keyed by query id. One scan + one |Q|-way fanout + one
    window exchange on q_id — at 100 TB this beats |Q| separate
    :func:`cosine_topk` scans whenever |Q| > 1, and the window shuffle
    carries only (q_id, id, cos) triples, never vectors. JVM
    sequential-fold dots keep it oracle-checkable.
    """
    if query_vec_ids is None:
        query_vec_ids = [0, 1, 2]
    q = embeddings.filter(F.col(id_col).isin(query_vec_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    cos = _cos_safe(F.col(vec_col), F.col("q_vec"))
    scored = (
        ensure_parallelism(embeddings)
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", id_col, F.round(cos, 4).alias("cos"))
        .filter(_finite_filter(F.col("cos")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("q_id", id_col, "cos", "rn")
    )


def _np_planes(dim: int, bits: int, tables: int, seed: int):
    """(tables, bits, dim) hyperplane tensor, deterministic in seed
    (same draw order as the original literal formulation)."""
    rng = random.Random(seed)
    return np.array(
        [
            [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
            for _ in range(tables)
        ],
        dtype=np.float64,
    )


def _np_buckets(X, planes) -> "object":
    """(n, tables) bucket ids: sign bits of X·plane packed per table."""
    tables, bits, dim = planes.shape
    S = X @ planes.reshape(tables * bits, dim).T  # (n, T*B)
    b = (S >= 0).astype(np.int64).reshape(len(X), tables, bits)
    weights = 1 << np.arange(bits, dtype=np.int64)
    return (b * weights).sum(axis=2)


def lsh_buckets_udf(
    dim: int, bits: int, tables: int, seed: int, planes=None
):
    """Arrow-batched bucket assignment: one BLAS matmul per batch against
    the (tables×bits, dim) plane matrix, bits packed in numpy. Replaces
    a tables×bits literal expression tree whose zip_with/aggregate dot
    products evaluated interpreted (measured ~4 s/500 vecs) and whose
    Janino compile grew with tables·bits·dim. Callers that already built
    the planes for a driver-side query bucket pass them in (one tensor,
    no chance of the two draws' parameters drifting apart)."""
    if planes is None:
        planes = _np_planes(dim, bits, tables, seed)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        if X.shape[1] != planes.shape[2]:
            raise ValueError(
                f"embedding dim {X.shape[1]} != configured dim "
                f"{planes.shape[2]} — pass dim= matching the column"
            )
        return pd.Series(list(_np_buckets(X, planes)))

    return buckets


def _cos_to_query_udf(qv: list[float]):
    """Arrow-batched cosine against one captured query vector."""
    q = np.asarray(qv, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0

    @F.pandas_udf("double")
    def cosq(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        n = np.linalg.norm(X, axis=1)
        n[n == 0.0] = 1.0
        return pd.Series((X @ q) / (n * qn))

    return cosq


def cos_pair_udf():
    """Arrow-batched pairwise cosine of two vector columns (candidate
    verification in the LSH all-pairs path)."""
    @F.pandas_udf("double")
    def cos_pair(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", A, B) / (na * nb))

    return cos_pair


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    bits: int = 8,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec: list[float] | None = None,
) -> DataFrame:
    """Approximate top-k: union of same-bucket candidates over L tables,
    exact cosine on candidates only.

    ``query_vec`` injects the pre-fetched query vector (the same sharing
    pattern as ``centroids`` on the IVF tiers): a caller probing several
    tiers with one query fetches the 1-row vector once instead of each
    tier paying its own collect job. Must be ``query_vec_id``'s actual
    vector — results are identical to the in-call fetch by construction.

    Candidate fraction ≈ L·2^-B of the table (plus correlation) — here
    8 tables × 8 bits ≈ 3% of rows scored instead of 100%. Recall is
    high when true neighbors are angularly close (the real-embedding
    regime; ≥0.9 on planted clusters in tests) and degrades toward the
    candidate fraction as neighbors approach orthogonality — for
    corpora like that, raise ``tables`` / lower ``bits``, or fall back
    to :func:`cosine_topk`.

    The query vector's buckets are computed driver-side with the SAME
    numpy code the executors run, then folded into the plan as literal
    equality filters — the scan stage is map-only (bucket UDF + filter +
    score UDF) into TakeOrderedAndProject; no join, no shuffle.
    """
    planes = _np_planes(dim, bits, tables, seed)
    if query_vec is None:
        query_vec = fetch_query_vec(
            embeddings, id_col, vec_col, query_vec_id
        )
    qv = [float(x) for x in query_vec]
    if len(qv) != dim:
        raise ValueError(
            f"embedding dim {len(qv)} != configured dim {dim} — the "
            f"hyperplanes were drawn for {dim}-wide vectors"
        )
    qb = _np_buckets(np.asarray([qv], dtype=np.float64), planes)[0]

    # reuse the tensor built for the query bucket above
    buckets = lsh_buckets_udf(dim, bits, tables, seed, planes=planes)
    tagged = ensure_parallelism(embeddings).select(
        id_col, vec_col, buckets(F.col(vec_col)).alias("bk")
    )
    same_bucket = None
    for t in range(tables):
        cond = F.col("bk")[t] == int(qb[t])
        same_bucket = cond if same_bucket is None else (same_bucket | cond)
    cosq = _cos_to_query_udf(qv)
    return (
        tagged.filter(F.col(id_col) != query_vec_id)
        .filter(same_bucket)
        .select(id_col, F.round(cosq(F.col(vec_col)), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def assign_centroids(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All input columns + ``cid`` = argmax-cosine centroid; exact
    similarity ties break to the lowest cid (np.argmax takes the first
    maximum).

    One Arrow-batched numpy kernel (batch×dim @ dim×k matmul) captured
    over the centroid matrix — map-only, zero shuffle, no per-iteration
    plan growth. Both literal-expression argmax (k×dim tree re-Janino-
    compiled every Lloyd iteration, ~8 s each) and broadcast-join +
    max_by (a shuffle per iteration, interpreted HOF dots) measured
    slower.
    """
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0.0] = 1.0

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        n = np.linalg.norm(X, axis=1)
        n[n == 0.0] = 1.0
        sims = (X @ C.T) / (n[:, None] * cn[None, :])
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return embeddings.withColumn("cid", nearest(F.col(vec_col)))


#: r15 (guide §4.1/§2.2): partition sizing for the CAPPED k-means
#: training table. The training set is ≤ train_cap rows by
#: construction, and each Lloyd iteration pays one Arrow/Python
#: round-trip PER PARTITION plus per-task scheduling; at ~4 k rows a
#: 64-dim assignment matmul is microseconds, so tasks below this many
#: rows are pure launch overhead (measured: 3 iterations over a
#: 2 000-row table at 32 round-robin partitions cost ~1.0 s each —
#: worker latency, not compute). Capped at defaultParallelism, so a
#: near-cap training set on a big cluster still fans out.
KMEANS_ROWS_PER_TASK = 4096


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = None,
    n_rows: int | None = None,
) -> list[list[float]]:
    """Spherical-ish k-means (cosine assignment, mean update) as Lloyd
    iterations over DataFrames.

    Each iteration is one distributed assign (codegen projection) + one
    partial-aggregated shuffle of (cid, pos, x) → per-dimension means; only
    the k×dim centroid table ever reaches the driver (same topology as
    MLlib KMeans). Init is the k lowest-id vectors — deterministic, no RNG.

    ``train_cap`` bounds the TRAINING set (the FAISS practice: a coarse
    quantizer needs ~100s of points per centroid, not the corpus): when
    the input exceeds the cap, training runs on the deterministic
    HASH-modulus sample ``pmod(xxhash64(id), ceil(n/cap)) == 0``
    (≈ n/ceil(n/cap) ≤ cap rows regardless of how ids are distributed —
    a raw id-modulus would return an empty sample on e.g. all-odd ids
    with an even modulus). At or below the cap — every unit-test
    corpus — geometry is byte-identical to uncapped. At 100 TB training
    the quantizer on the full corpus per build is the anti-pattern this
    exists to avoid.

    ``n_rows`` (r15) injects an already-known input count so a caller
    that counted the corpus anyway (ann_recall_report) doesn't pay the
    count job twice. When the cap is active the training table is also
    repartitioned to ≤ ``KMEANS_ROWS_PER_TASK`` rows per task instead
    of full cluster width — the capped sample is small by construction
    and per-iteration Python-worker round trips dominate otherwise
    (see the constant above). Uncapped callers keep the original
    ensure_parallelism width: their input size is unknown.
    """
    train_par = None
    if train_cap is not None:
        n = n_rows if n_rows is not None else embeddings.count()
        mod = -(-n // train_cap)  # ceil: n > cap always downsamples
        if mod > 1:
            embeddings = embeddings.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0
            )
        train_n = n // mod if mod > 1 else n
        try:
            par_cap = embeddings.sparkSession.sparkContext.defaultParallelism
        except Exception:
            par_cap = 8  # Spark Connect: no sparkContext
        train_par = max(1, min(par_cap, -(-train_n // KMEANS_ROWS_PER_TASK)))
    init = embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
    if not init:
        raise ValueError("kmeans_centroids: empty input, nothing to train on")
    centroids = [[float(x) for x in r[0]] for r in init]
    k = len(centroids)  # corpora smaller than k: one cell per vector
    dim = len(centroids[0])
    # checkpoint once: every Lloyd iteration re-evaluates this input,
    # and without it each of the ``iters`` jobs re-runs the scan AND
    # the round-robin exchange (measured ~0.3 s/iteration of pure
    # re-read overhead at sf0.1). At real scale training runs on a
    # bounded sample, so materializing it is cheap by construction.
    if train_par is not None:
        embeddings = embeddings.repartition(train_par).localCheckpoint(
            eager=True
        )
    else:
        embeddings = ensure_parallelism(embeddings).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = assign_centroids(embeddings, centroids, id_col, vec_col).select(
            "cid", F.posexplode(vec_col)
        )
        rows = assigned.groupBy("cid", "pos").agg(F.avg("col").alias("m")).collect()
        new = {cid: [0.0] * dim for cid in {r["cid"] for r in rows}}
        for r in rows:
            new[r["cid"]][r["pos"]] = float(r["m"])
        # empty clusters keep their previous centroid
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    train_cap: int | None = None,
    query_vec: list[float] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists (k-means cells), probe the ``nprobe``
    cells nearest the query, exact cosine inside the probed cells only.

    The second of the two ANN scale paths (with :func:`ann_lsh_topk`).
    At real scale the assignment (`cid`) is computed once and persisted
    as a partition column, so a query reads nprobe/n_centroids of the
    data via partition pruning; here the cell filter plays that role —
    ~nprobe/n_centroids of rows reach the cosine scorer.

    ``centroids`` injects pre-trained geometry (the semantic_dedup /
    StreamingVectorIndex pattern): a caller serving several tiers from
    one coarse quantizer trains once and shares — identical results to
    in-call training with the same (k, iters) since training is
    deterministic. ``query_vec`` injects the pre-fetched query vector
    the same way (see :func:`ann_lsh_topk`).
    """
    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, n_centroids, iters, id_col, vec_col, train_cap
        )
    if query_vec is None:
        query_vec = fetch_query_vec(
            embeddings, id_col, vec_col, query_vec_id
        )
    qv = [float(x) for x in query_vec]

    def cos_py(c: list[float]) -> float:
        d = sum(a * b for a, b in zip(qv, c))
        nq = math.sqrt(sum(a * a for a in qv))
        nc = math.sqrt(sum(a * a for a in c)) or 1.0
        return d / (nq * nc)

    probe = sorted(range(len(centroids)), key=lambda i: -cos_py(centroids[i]))[:nprobe]

    assigned = assign_centroids(
        ensure_parallelism(embeddings), centroids, id_col, vec_col
    )
    cosq = _cos_to_query_udf(qv)
    return (
        assigned.filter(F.col("cid").isin([int(p) for p in probe]))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, F.round(cosq(F.col(vec_col)), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def _pq_codebooks(
    X: "np.ndarray", m: int, ksub: int, iters: int
) -> "np.ndarray":
    """(m, ksub, dsub) product-quantization codebooks via per-subspace
    Lloyd k-means on a training sample. Deterministic: init is the first
    ``ksub`` sample subvectors, ties in assignment take the lowest code
    (np.argmin first-minimum), empty codes keep their previous centroid.
    """
    n, dim = X.shape
    ksub = min(ksub, n)  # tiny corpora: never more codewords than samples
    if dim % m:
        raise ValueError(
            f"product quantization needs dim divisible by m_subvectors: "
            f"dim={dim}, m={m} (trailing dims would be silently dropped)"
        )
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:ksub].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books[j] = C
    return books


def _pq_encode(X: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """(n, m) uint8 code matrix: nearest codeword per subspace."""
    m, ksub, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def ivf_pq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m_subvectors: int = 8,
    n_codes: int = 16,
    train_rows: int = 256,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    train_cap: int | None = None,
    query_vec: list[float] | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: IVF coarse cells prune the scan (as in
    :func:`ivf_topk`), and inside the probed cells vectors are scored
    from their PRODUCT-QUANTIZATION codes only — ``m_subvectors`` bytes
    + one float norm per vector instead of the float array.

    The compressed-serving tier of the ANN stack: at 100 TB a 64-dim
    float32 corpus is 256 B/vector; the (cid, codes, norm) table is
    ~12 B/vector (~21×), small enough to keep resident while the float
    vectors stay in cold storage. Scoring is FAISS-style ADC: the query
    is cut into subvectors, a (m × n_codes) inner-product lookup table
    is built driver-side, and each candidate's approximate dot is m
    table lookups summed — no float-vector I/O on the query path.

    Plan shape: codebooks train on a driver-side sample (the
    ``train_rows`` lowest-id vectors — deterministic, the FAISS
    training-sample pattern); encode + score are captured-numpy Arrow
    UDFs, map-only; candidate filter is ``cid IN probes``; top-k is
    TakeOrderedAndProject. Zero shuffles on the query path (the only
    shuffles are inside k-means training, amortized across queries at
    real scale where the index is built once and persisted with cid as
    a partition column).

    Rows-only by design (numpy accumulation + k-means codebooks aren't
    SQL-expressible); recall-gated in tests/test_similarity.py.
    ``centroids`` injects shared pre-trained geometry (see
    :func:`ivf_topk`); ``query_vec`` injects the pre-fetched query
    vector (see :func:`ann_lsh_topk`).
    """
    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, n_centroids, iters, id_col, vec_col, train_cap
        )
    sample = (
        embeddings.orderBy(id_col).limit(train_rows).select(vec_col).collect()
    )
    Xtrain = np.asarray([list(r[0]) for r in sample], dtype=np.float64)
    books = _pq_codebooks(Xtrain, m_subvectors, n_codes, iters)

    if query_vec is None:
        query_vec = fetch_query_vec(
            embeddings, id_col, vec_col, query_vec_id
        )
    qv = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = float(np.linalg.norm(qv)) or 1.0

    def cos_py(c: list[float]) -> float:
        cc = np.asarray(c, dtype=np.float64)
        nc = float(np.linalg.norm(cc)) or 1.0
        return float(cc @ qv) / (nc * qn)

    probe = sorted(range(len(centroids)), key=lambda i: -cos_py(centroids[i]))[:nprobe]

    m, ksub, dsub = books.shape
    # ADC lookup table: lut[j, c] = <q_subvector_j, codeword_jc>
    lut = np.einsum("jd,jcd->jc", qv.reshape(m, dsub), books)  # (m, ksub)

    @F.pandas_udf("array<int>")
    def pq_codes(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(list(_pq_encode(X, books).astype(np.int32)))

    @F.pandas_udf("double")
    def adc_dot(codes_s: pd.Series) -> pd.Series:
        C = np.stack(codes_s.to_numpy()).astype(np.int64)
        return pd.Series(lut[np.arange(m)[None, :], C].sum(axis=1))

    # the INDEX: (id, cid, codes, nrm) — what's persisted at real scale;
    # the float vector column is dropped before the query path begins
    index = (
        assign_centroids(ensure_parallelism(embeddings), centroids, id_col, vec_col)
        .select(
            id_col,
            "cid",
            pq_codes(F.col(vec_col)).alias("codes"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
    )
    score = adc_dot(F.col("codes")) / (
        F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(F.lit(1.0)) * F.lit(qn)
    )
    return (
        index.filter(F.col("cid").isin([int(p) for p in probe]))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, F.round(score, 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|x| / 127``,
    ``code_i = floor(x_i / scale + 0.5)`` — the storage/serving tier for
    embedding corpora at 100 TB scale (4× smaller than float32; dot
    products run in integer arithmetic against a dequantization scale).

    Entirely JVM-side higher-order functions over the array column —
    map-only, zero shuffle, scan-parallel. ``floor(x/scale + 0.5)`` is
    spelled out instead of a cast or round() because engines disagree on
    CAST/round half-way behavior; floor of a double is bit-deterministic
    everywhere, which is what lets the DuckDB oracle hash-match the
    codes exactly. Zero vectors quantize to all-zero codes at scale 0.

    Non-finite contract (r14 hostile-numeric sweep): a vector containing
    any NaN/±Inf element quantizes to ``scale = NULL, codes = NULL`` —
    an explicit missing marker, not engine-dependent garbage codes
    (Spark's floor(NaN) and DuckDB's CAST(NaN AS INT) disagree, and the
    DuckDB side errors outright). Serving paths skip NULL-code rows.

    Returns (id, scale, codes array<int>).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    finite_all = F.forall(
        v, lambda x: ~F.isnan(x) & (F.abs(x) < F.lit(float("inf")))
    )
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    raw_scale = amax / F.lit(127.0)
    codes = F.transform(
        v,
        lambda x: F.when(amax > 0, F.floor(x / raw_scale + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return embeddings.select(
        F.col(id_col),
        F.when(finite_all, raw_scale).alias("scale"),
        F.when(finite_all, codes).alias("codes"),
    )


def quantized_dot_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over the int8-quantized codes — the SERVING
    side of :func:`quantize_int8`: ``dot(codes_a, codes_q) · scale_a ·
    scale_q`` approximates the float dot product, ranking near-neighbors
    without touching the float vectors (at scale only the 4×-smaller
    code table is resident; error per dim ≤ half a quantization step).

    Unlike the float ANN tiers (whose numpy accumulation order makes
    them rows-only), this path is fully ORACLE-CHECKABLE: the integer
    dot is exact (|codes| ≤ 127, 64 dims → ≪ 2⁵³) and the rescale is
    two double multiplies — bit-identical on any engine. Plan shape:
    map-only quantize projection, broadcast 1-row query codes, integer
    zip_with/aggregate fold, TakeOrderedAndProject — no shuffle.
    """
    # NULL-code rows are non-finite vectors (quantize_int8's r14
    # contract) — they can't rank; a non-finite QUERY yields empty
    q = quantize_int8(embeddings, id_col, vec_col).filter(
        F.col("scale").isNotNull()
    )
    qq = q.filter(F.col(id_col) == query_vec_id).select(
        F.col("codes").alias("q_codes"), F.col("scale").alias("q_scale")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("q_codes"), lambda x, y: (x * y).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = dot.cast("double") * F.col("scale") * F.col("q_scale")
    return (
        q.crossJoin(F.broadcast(qq))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, F.round(score, 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-duplicate pairs: ALL pairs with cosine ≥
    threshold via brute-force cross join.

    O(N²·d) — the oracle/recall baseline for
    :func:`cosine_self_join_above` (the LSH-bucketed scale path), same
    role :func:`dedup.near_dup_pairs_exact` plays for MinHash. SQL-
    expressible, so it gives the embedding-dedup tier a DuckDB-checked
    driver row.
    """
    a = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    cos = _cos_safe(F.col("vec_a"), F.col("vec_b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cos, 4))
        .filter(_finite_filter(F.col("cos")) & (F.col("cos") >= threshold))
        .select("id_a", "id_b", "cos")
    )


def cosine_self_join_above(
    embeddings: DataFrame,
    threshold: float = 0.3,
    bits: int = 8,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs with cosine ≥ threshold,
    LSH-bucketed so the pairwise step is per-bucket, not global.

    The all-pairs analogue of :func:`ann_lsh_topk`; used for
    embedding-level dedup of training corpora. Bucket assignment is one
    Arrow/numpy UDF call per row (then posexplode to (table, bucket)
    rows); candidate verification is the pairwise numpy cosine.

    Scale shape (same discipline as ``dedup.minhash_lsh_pairs``): each
    (table, bucket) cell's members are collected in ONE aggregate,
    cells larger than ``max_bucket_size`` are dropped (a dense LSH cell
    means near-parallel boilerplate vectors; its pairwise expansion is
    the only quadratic risk here), ordered candidate pairs come from a
    nested transform, and the cross-table dedup runs on *ids only* —
    embedding vectors never pass through the distinct's exchange; they
    re-attach by two id-equi joins afterwards.
    """
    buckets = lsh_buckets_udf(dim, bits, tables, seed)
    tagged = (
        ensure_parallelism(embeddings)
        .select(id_col, F.posexplode(buckets(F.col(vec_col))).alias("t", "b"))
    )
    members = (
        tagged.groupBy("t", "b")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        ordered_pairs,
    )

    cand = (
        members.select(
            ordered_pairs(F.col("ids"), lambda x, y: F.array(x, y)).alias("p")
        )
        .select(F.col("p")[0].alias("id_a"), F.col("p")[1].alias("id_b"))
        .distinct()
    )
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    cos_pair = cos_pair_udf()
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cos_pair(F.col("vec_a"), F.col("vec_b")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def assign_centroids_topp(
    embeddings: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe cell assignment: one output row per (vector, cell)
    for the vector's ``nprobe`` most-cosine-similar centroids — the
    standard mitigation for duplicates that straddle a single-argmax
    cell boundary (each vector is visible in its runner-up cells too).

    Same map-only Arrow kernel shape as :func:`assign_centroids`; ties
    rank deterministically (stable argsort → lowest cid first). The
    explode multiplies downstream pair-generation input by ``nprobe``,
    not the corpus storage — callers dedup pairs found in several
    shared cells.
    """
    C = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0.0] = 1.0
    p = min(nprobe, len(centroids))

    @F.pandas_udf("array<int>")
    def nearest_p(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        n = np.linalg.norm(X, axis=1)
        n[n == 0.0] = 1.0
        sims = (X @ C.T) / (n[:, None] * cn[None, :])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :p]
        return pd.Series(list(idx.astype(np.int32)))

    # posexplode keeps the probe rank: rank 0 is the argmax (primary)
    # cell — callers that need population counts must count primaries
    # only, or multi-probe inflation skews them
    return embeddings.select(
        "*", F.posexplode(nearest_p(F.col(vec_col))).alias("probe_rank", "cid")
    )


def grouped_cell_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    new_col: str | None = None,
    emit_cos: bool = False,
) -> DataFrame:
    """Within-cell above-threshold cosine pairs as ONE grouped matrix
    product per ``cid`` cell (the SemDeDup paper's per-cluster GEMM) —
    THE shared pair kernel of the batch operator and its streaming twin
    (one formulation, so stream==batch parity cannot drift on ULPs at
    the threshold boundary).

    Replaces the r6 ``cid`` self-join + per-pair Arrow kernel, which
    materialized BOTH float vectors on every candidate row — at the 25×
    worst-case smoke shape that was ~25 GB of pair-expanded Arrow
    traffic for ~25 MB of underlying vectors (measured r12: 89 s in the
    join form vs ~2 s grouped; the 25× smoke leg dropped 165.6 s →
    11.9 s). Each cell's vectors cross Arrow once; rows of the cosine
    matrix are computed in fixed 1024-row blocks so peak memory is
    O(block × cell) even at the documented 10⁴-row cell sizing; the
    strict upper triangle of the id-SORTED cell preserves the
    ``doc_a < doc_b`` output contract.

    ``new_col`` (streaming): boolean column — only pairs involving at
    least one new row are emitted (old×old pairs were logged by earlier
    batches). ``emit_cos`` adds the cosine value (the twin's pair log
    carries it for max-dedup across probe multiplicity).
    """
    import pandas as pd  # noqa: PLC0415 — executor-side type only

    id_type = dict(assigned.dtypes)[id_col]
    thr = float(threshold)

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(X, axis=1)
        nrm[nrm == 0.0] = 1.0
        Xn = X / nrm[:, None]
        is_new = pdf[new_col].to_numpy() if new_col else None
        outs = []
        block = 1024
        for s in range(0, len(ids), block):
            sims = Xn[s : s + block] @ Xn.T  # (b, n)
            bi, j = np.nonzero(sims >= thr)
            gi = bi + s
            # Strict upper triangle BY ID VALUE, not position: with
            # at-least-once delivery the streaming twin can land the
            # same vec_id twice in one frozen-geometry cell (already
            # persisted + redelivered with is_new=True); a positional
            # j > gi would emit the (X, X, cos=1.0) self-pair that the
            # pre-GEMM `doc_a < doc_b` join filter suppressed.
            keep = ids[j] > ids[gi]
            if is_new is not None:
                keep &= is_new[gi] | is_new[j]
            if keep.any():
                rec = {"doc_a": ids[gi[keep]], "doc_b": ids[j[keep]]}
                if emit_cos:
                    rec["cos"] = sims[bi[keep], j[keep]]
                outs.append(pd.DataFrame(rec))
        if not outs:
            empty = {"doc_a": ids[:0], "doc_b": ids[:0]}
            if emit_cos:
                empty["cos"] = np.array([], dtype=np.float64)
            return pd.DataFrame(empty)
        return pd.concat(outs, ignore_index=True)

    schema = f"doc_a {id_type}, doc_b {id_type}"
    if emit_cos:
        schema += ", cos double"
    return assigned.groupBy("cid").applyInPandas(cell_pairs, schema)


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.92,
    n_centroids: int = 16,
    iters: int = 3,
    max_cell_size: int = 4096,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    document embeddings into IVF cells, find above-threshold cosine pairs
    WITHIN each cell only, and assign every document to the canonical
    (minimum-id) member of its semantic-duplicate component.

    Returns (``id_col``, canon_id): ``canon_id == id`` for documents to
    keep, the canonical representative's id otherwise — the same
    materialization contract as ``dedup.near_dup_clusters``, so the keep
    step downstream is identical (``filter(id == canon_id)``).

    Scale shape: the pairwise stage is confined to cells (corpus/k rows
    each), so work is O(N²/k) worst-case and embarrassingly parallel by
    ``cid`` — the SemDeDup paper's exact trick, realized as one grouped
    matrix product per cell (each cell's vectors cross Arrow ONCE and
    BLAS does the O(cell²) math in row blocks; the earlier ``cid``
    self-join expanded both float vectors onto every candidate row —
    ~1000× the Arrow traffic at the 25× smoke shape). At production
    scale raise ``n_centroids`` to keep mean cells comfortably UNDER
    ``max_cell_size`` — k ≈ N/10³ at the 4096 default, or raise both
    together for ~10⁴-row cells (sizing k from 10⁴ while leaving the
    default cap suppresses every cell) — and
    persist the assignment as a partition column; duplicates that
    straddle a cell boundary are the documented recall loss (the paper's
    too — mitigate with multi-probe assignment if it matters). K-means
    topology: only the k×dim centroid table touches the driver.

    ``max_cell_size`` is the quadratic-blowup guard, same contract as
    the ``max_bucket_size`` caps in operators/dedup.py: a cell larger
    than the cap is EXCLUDED from pair generation (its members keep
    themselves) rather than allowed to expand O(cell²). A cell that
    big means ``n_centroids`` is undersized for the corpus — raise k;
    the cap converts a silent cluster-killer into a bounded,
    documented recall loss.
    """
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        near_dup_clusters,
    )

    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, n_centroids, iters, id_col, vec_col
        )
    # else: injected frozen geometry — the streaming twin's parity path
    # (streaming/semantic_dedup.py trains once, on its first batch, and
    # the batch op re-run with the SAME centroids must agree exactly)
    if nprobe > 1:
        # multi-probe: vectors visible in their runner-up cells too, so
        # boundary-straddling duplicates still meet in SOME shared cell
        assigned = assign_centroids_topp(
            ensure_parallelism(embeddings), centroids, nprobe, id_col, vec_col
        ).select(F.col(id_col), F.col(vec_col), "probe_rank", "cid")
    else:
        assigned = assign_centroids(
            ensure_parallelism(embeddings), centroids, id_col, vec_col
        ).select(
            F.col(id_col), F.col(vec_col), F.lit(0).alias("probe_rank"), "cid"
        )
    # materialize once: the size aggregate, the semi-join probe, and
    # the grouped pair kernel all read this subtree — un-checkpointed,
    # the full-corpus assignment kernel would re-execute per consumer
    assigned = assigned.localCheckpoint(eager=True)
    # cell-size gate via a k-row aggregate broadcast back (NOT a window
    # count, which would drag vectors through an extra exchange+sort).
    # It counts the full cell population — primaries AND multi-probe
    # visitors — because that is what the grouped pair kernel below
    # squares: a primaries-only count let a centrally-located cell that
    # is runner-up for half the corpus pass the gate and still expand
    # O(visitors²) (and a cell with zero primaries had no group row at
    # all, so the semi-join dropped its visitors — losing exactly the
    # boundary pairs nprobe>1 exists to catch). Multi-probe inflates
    # counts by ≤ nprobe; size max_cell_size accordingly.
    small_cells = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_cell_size)
        .select("cid")
    )
    assigned = assigned.join(F.broadcast(small_cells), "cid", "left_semi")
    pairs = grouped_cell_pairs(assigned, threshold, id_col, vec_col)
    if nprobe > 1:  # a pair can meet in several shared cells
        pairs = pairs.distinct()
    return near_dup_clusters(
        embeddings.select(F.col(id_col).alias("doc_id")), pairs
    ).select(F.col("doc_id").alias(id_col), "canon_id")
