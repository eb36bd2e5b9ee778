"""DuckDB oracle SQL for every SQL-expressible engine query.

One entry per ``__spark_entry__.queries()`` key. Each statement is ANSI
SQL runnable by DuckDB over the pre-registered parquet views (region,
nation, customer, supplier, part, orders, lineitem, events, documents,
embeddings), and every computed column carries the SAME alias as the
Spark query so the driver's sorted-column value hash lines up.

Type-parity rules used throughout (Spark ↔ DuckDB):

- COUNT(*)                         → BIGINT on both sides, no cast.
- SUM(BIGINT)                      → HUGEINT in DuckDB → CAST(.. AS BIGINT).
- ROUND(SUM(double), k)            → DOUBLE on both; rounding at the edge
                                     absorbs partial-agg ordering noise.
- timestamps in output             → strftime'd to 'yyyy-MM-dd HH:mm:ss'
                                     strings (engines disagree on tz/µs
                                     rendering, strings don't).
- GROUPING(a, b)                   → same bit layout as Spark grouping_id.
"""

from __future__ import annotations


def _fin_cos(a: str, b: str) -> str:
    """Participation predicate for exact-cosine legs, mirroring the
    engine's ``similarity._cos_safe`` + ``_finite_filter`` contract
    (r14 hostile-numeric sweep): only vector pairs with a finite,
    well-defined cosine rank. Computed MANUALLY (dot / (|a|·|b|))
    because DuckDB's ``list_cosine_similarity`` CLAMPS to [-1, 1] —
    a zero-norm or NaN-element vector silently reads as -1.0 there,
    while the engine excludes it. The clamping builtin still supplies
    the VALUE for surviving rows (identical to manual on the finite
    domain after ROUND 4)."""
    return (
        f"isfinite(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b}))))"
    )


#: the same predicate instantiated for the common (a=query, b=corpus)
#: join aliases used by every cosine oracle below
_FIN_COS_AB = _fin_cos(
    "CAST(a.embedding AS DOUBLE[])", "CAST(b.embedding AS DOUBLE[])"
)

ORACLE_SQL: dict[str, str] = {
    # --- aggregations --------------------------------------------------
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
               ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
               ROUND(AVG(l_discount), 6)                                        AS avg_disc,
               COUNT(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "filtered_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """,
    "distinct_suppliers_per_flag": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "rollup_returns": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*)                  AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_orders": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*)                    AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "conditional_agg_status": """
        SELECT ROUND(
                 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                       / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "group_having": """
        SELECT o_custkey,
               COUNT(*)                    AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 12
    """,
    # --- joins ---------------------------------------------------------
    "revenue_by_segment": """
        SELECT c_mktsegment,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*)                                          AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        GROUP BY c_mktsegment
    """,
    "customers_per_region": """
        SELECT r_name,
               COUNT(*)                  AS n_customers,
               ROUND(SUM(c_acctbal), 2)  AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "customers_with_open_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "supplier_nation_outer": """
        SELECT n_name,
               COUNT(s_suppkey)                          AS n_suppliers,
               ROUND(COALESCE(SUM(s_acctbal), 0.0), 2)   AS sum_acctbal
        FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        GROUP BY n_name
    """,
    "theta_join_price_band": """
        SELECT DISTINCT a.p_partkey AS a_key, b.p_partkey AS b_key, a.p_brand AS a_brand
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand
         AND a.p_partkey < b.p_partkey
         AND ABS(a.p_retailprice - b.p_retailprice) <= 1.0
    """,
    # --- windows ---------------------------------------------------------
    "top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
    """,
    # NULLS FIRST spells Spark's ascending default (r15 hostile-dates:
    # DuckDB defaults NULLS LAST — an undated order silently reordered
    # every delta/running total in its customer's history)
    "order_price_delta": """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice - LAG(o_totalprice) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey), 2)
                 AS price_delta
        FROM orders
    """,
    "running_customer_spend": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_spend
        FROM orders
    """,
    "events_moving_hour_sum": """
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               ROUND(SUM(value) OVER w, 2) AS moving_sum_1h,
               COUNT(*) OVER w             AS n_events_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    "customer_value_ntile": """
        SELECT c_custkey, c_mktsegment,
               CAST(NTILE(4) OVER w AS BIGINT)   AS balance_quartile,
               ROUND(PERCENT_RANK() OVER w, 6)   AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6)      AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    # --- sort / limit / set ops -----------------------------------------
    "top_orders": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "region_nations_agg": """
        SELECT r_name,
               STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
               COUNT(*)                                AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "nation_set_ops": """
        WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
             s AS (SELECT s_nationkey AS nationkey FROM supplier)
        SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
        UNION ALL
        SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        UNION ALL
        SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    """,
    # --- events ----------------------------------------------------------
    "events_hourly": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    # tolerant extraction on BOTH sides (r14 JSON-hostile probe):
    # TRY_CAST(props AS JSON) nulls malformed JSON (DuckDB's
    # json_extract ERRORS on it where Spark returns NULL) and the
    # BIGINT TRY_CAST nulls object-valued k like Spark's try_cast
    "events_json_props": """
        SELECT event_type,
               COUNT(*)                                                AS n_events,
               CAST(SUM(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               ROUND(AVG(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)), 6)       AS avg_k
        FROM events
        GROUP BY event_type
    """,
    # variant twin of events_json_props: the engine goes through Spark
    # 4's binary VARIANT encoding; the oracle re-derives from JSON text —
    # equal results prove the variant path is lossless
    "events_variant_props": """
        SELECT event_type,
               COUNT(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS n_with_k,
               CAST(MIN(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(MAX(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(SUM(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type
    """,
    "shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-01'
          AND l_shipdate  > TIMESTAMP '1997-06-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "doc_split_assign": """
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(COALESCE(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')), 0)) AS BIGINT) AS sum_tokens
        FROM (SELECT text, ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296 % 100 AS b
              FROM documents)
        GROUP BY 1
    """,
    # sequence packing: recursive CTE replays the engine's deterministic
    # next-fit scan (doc_id order within Knuth-hash pack groups, running
    # token sum resetting when 256 would be exceeded) — the recursion
    # advances every group by one document per step
    "doc_pack_sequences": r"""
        WITH RECURSIVE base AS (
          SELECT doc_id, pack_group, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY pack_group ORDER BY doc_id) AS rn
          FROM (SELECT doc_id,
                       CAST((CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 + 4294967296) % 4294967296 % 8 AS INT) AS pack_group,
                       CAST(COALESCE(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')), 0) AS BIGINT) AS n_tokens
                FROM documents)),
        pack(pack_group, rn, doc_id, n_tokens, seq_id, seq_tokens) AS (
          SELECT pack_group, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.pack_group, b.rn, b.doc_id, b.n_tokens,
                 CASE WHEN p.seq_tokens + b.n_tokens > 256 THEN p.seq_id + 1 ELSE p.seq_id END,
                 CASE WHEN p.seq_tokens + b.n_tokens > 256 THEN b.n_tokens ELSE p.seq_tokens + b.n_tokens END
          FROM pack p JOIN base b ON b.pack_group = p.pack_group AND b.rn = p.rn + 1)
        SELECT doc_id, pack_group, n_tokens, CAST(seq_id AS BIGINT) AS seq_id FROM pack
    """,
    # Spark-native recursive CTE twin: the engine runs the SAME recursion
    # in Spark SQL (relational.py::doc_pack_sequences_sql), so the oracle
    # is byte-identical to doc_pack_sequences'
    "doc_pack_sequences_sql": r"""
        WITH RECURSIVE base AS (
          SELECT doc_id, pack_group, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY pack_group ORDER BY doc_id) AS rn
          FROM (SELECT doc_id,
                       CAST((CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 + 4294967296) % 4294967296 % 16 AS INT) AS pack_group,
                       CAST(COALESCE(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')), 0) AS BIGINT) AS n_tokens
                FROM documents)),
        pack(pack_group, rn, doc_id, n_tokens, seq_id, seq_tokens) AS (
          SELECT pack_group, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.pack_group, b.rn, b.doc_id, b.n_tokens,
                 CASE WHEN p.seq_tokens + b.n_tokens > 256 THEN p.seq_id + 1 ELSE p.seq_id END,
                 CASE WHEN p.seq_tokens + b.n_tokens > 256 THEN b.n_tokens ELSE p.seq_tokens + b.n_tokens END
          FROM pack p JOIN base b ON b.pack_group = p.pack_group AND b.rn = p.rn + 1)
        SELECT doc_id, pack_group, n_tokens, CAST(seq_id AS BIGINT) AS seq_id FROM pack
    """,
    "events_pattern_match": """
        WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        per_hour AS (
          SELECT user_id, EXTRACT(hour FROM ts) AS hour, COUNT(*) AS n
          FROM events, d0
          WHERE CAST(ts AS DATE) = d0.d0
          GROUP BY 1, 2),
        users AS (SELECT DISTINCT user_id FROM per_hour),
        hours AS (SELECT CAST(UNNEST(range(0, 24)) AS INT) AS hour),
        grid AS (SELECT u.user_id, h.hour FROM users u CROSS JOIN hours h),
        scored AS (
          SELECT g.user_id,
                 CAST(SUM((COALESCE(p.n, 0) - g.hour % 6)
                        * (COALESCE(p.n, 0) - g.hour % 6)) AS BIGINT) AS dist_sq
          FROM grid g LEFT JOIN per_hour p
            ON p.user_id = g.user_id AND p.hour = g.hour
          GROUP BY 1)
        SELECT user_id, dist_sq FROM scored
        ORDER BY dist_sq, user_id LIMIT 5
    """,
    "events_funnel": """
        WITH pu AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
          FROM events GROUP BY 1),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN pu ON pu.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > pu.t_view
          GROUP BY 1),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY 1)
        SELECT '1_view' AS stage, COUNT(t_view) AS n_users FROM pu
        UNION ALL SELECT '2_click', COUNT(*) FROM c
        UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
    "events_retention_cohorts": """
        WITH activity AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        cohort AS (
          SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY 1)
        SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(a.day - c.cohort_day AS INT) AS day_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM activity a JOIN cohort c USING (user_id)
        WHERE a.day - c.cohort_day <= 7
        GROUP BY 1, 2
    """,
    "user_value_scd2": """
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 COUNT(*) AS n_events,
                 ROUND(SUM(value), 2) AS day_value
          FROM events
          WHERE ts IS NOT NULL  -- no activity day to version (r15)
          GROUP BY 1, 2)
        SELECT user_id,
               n_events,
               day_value,
               strftime(day, '%Y-%m-%d') AS valid_from,
               COALESCE(strftime(LEAD(day) OVER (PARTITION BY user_id ORDER BY day),
                                 '%Y-%m-%d'), '9999-12-31') AS valid_to,
               CAST(LEAD(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
                    AS INT) AS is_current
        FROM daily
    """,
    # incremental twin: same oracle — the upsert store must
    # reconstruct exactly the batch operator's history
    "scd2_incremental_roundtrip": """
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 COUNT(*) AS n_events,
                 ROUND(SUM(value), 2) AS day_value
          FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-09' GROUP BY 1, 2)
        SELECT user_id,
               n_events,
               day_value,
               strftime(day, '%Y-%m-%d') AS valid_from,
               COALESCE(strftime(LEAD(day) OVER (PARTITION BY user_id ORDER BY day),
                                 '%Y-%m-%d'), '9999-12-31') AS valid_to,
               CAST(LEAD(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
                    AS INT) AS is_current
        FROM daily
    """,
    "recent_orders_lateral": """
        WITH ranked AS (
          SELECT c.c_custkey, c.c_mktsegment,
                 o.o_orderkey,
                 strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                 o.o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY c.c_custkey
                   -- NULLS LAST spelled explicitly: an undated order is
                   -- never "most recent" (r15 — both engines' defaults
                   -- agree here only by coincidence)
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC) AS rn
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey)
        SELECT c_custkey, c_mktsegment, o_orderkey, o_orderdate, o_totalprice
        FROM ranked WHERE rn <= 2
    """,
    # shard roundtrip: split + per-(split, pack_group) next-fit replayed
    # by one recursive CTE, rolled up per split — matches only if the
    # partitioned shard write/read lost nothing and packing is identical
    "training_shards_roundtrip": r"""
        WITH RECURSIVE base AS (
          SELECT doc_id, split, pack_group, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY split, pack_group ORDER BY doc_id) AS rn
          FROM (SELECT doc_id,
                       CASE WHEN b < 80 THEN 'train'
                            WHEN b < 90 THEN 'val'
                            ELSE 'test' END AS split,
                       CAST((CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 + 4294967296) % 4294967296 % 8 AS INT) AS pack_group,
                       CAST(COALESCE(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')), 0) AS BIGINT) AS n_tokens
                FROM (SELECT doc_id, text,
                             ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296 % 100 AS b
                      FROM documents))),
        pack(split, pack_group, rn, doc_id, n_tokens, seq_id, seq_tokens) AS (
          SELECT split, pack_group, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.split, b.pack_group, b.rn, b.doc_id, b.n_tokens,
                 CASE WHEN p.seq_tokens + b.n_tokens > 256 THEN p.seq_id + 1 ELSE p.seq_id END,
                 CASE WHEN p.seq_tokens + b.n_tokens > 256 THEN b.n_tokens ELSE p.seq_tokens + b.n_tokens END
          FROM pack p JOIN base b
            ON b.split = p.split AND b.pack_group = p.pack_group AND b.rn = p.rn + 1)
        SELECT split,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT pack_group * 1000000 + seq_id) AS n_seqs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM pack
        GROUP BY split
    """,
    # corpus QA profile: per-column stats, one UNION ALL branch per
    # column (the engine computes them in ONE scan via stack-unpivot)
    "doc_table_profile": """
        SELECT 'doc_id' AS column, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT doc_id) AS n_distinct,
               CAST(MIN(doc_id) AS VARCHAR) AS min_value,
               CAST(MAX(doc_id) AS VARCHAR) AS max_value
        FROM documents
        UNION ALL
        SELECT 'text', COUNT(*),
               CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT text), MIN(text), MAX(text)
        FROM documents
        UNION ALL
        SELECT 'lang', COUNT(*),
               CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT lang), MIN(lang), MAX(lang)
        FROM documents
        UNION ALL
        SELECT 'source', COUNT(*),
               CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT source), MIN(source), MAX(source)
        FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(*),
               CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT n_chars),
               CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
        FROM documents
    """,
    # exactly-once gate: the engine's result comes through fake-Kinesis
    # replay WITH injected duplicate deliveries + streaming dedup +
    # parquet store round trip; the oracle rolls up the ORIGINAL table —
    # they hash-match only if the duplicates collapsed losslessly
    # SUM skips non-finite values: the JSON wire transports NaN/±Inf as
    # null by contract (RFC 8259 has no tokens for them — see the rec()
    # encoder in plans/registry.py), so the replayed rows carry NULL
    # there; identical on all-finite data
    # event-time domain (r15 hostile-dates): mirrors the engine's
    # in_ts_spine_domain guard in dedup_within_watermark (watermark
    # poisoning — one year-9999 delivery drops every later record).
    # The wire serializes ts at second granularity, so an instant
    # within 1 s above the HI bound would truncate INTO the envelope
    # on the engine side only — latent, boundary-day instants are not
    # a planted fixture and the bounds are whole days.
    # ... and the in-horizon domain: records older than the 3650-day
    # dedup horizon below the stream max are dropped deterministically
    # (the entry pre-filters; see plans/registry.py). date_trunc makes
    # the cutoff second-granular like the wire's strftime — the two
    # comparisons are equivalent because floor is monotonic and the
    # cutoff is whole-second.
    "kinesis_exactly_once_rollup": """
        SELECT event_type,
               COUNT(*)                 AS n_events,
               COUNT(DISTINCT event_id) AS n_ids,
               -- decimal-exact sum (r15): a double SUM is summation-
               -- order-dependent and straddled a cent boundary across
               -- engines; DECIMAL(18,9) partials are order-free exact.
               -- Domain mirrors the engine's in_decimal_domain; the
               -- wire already transports non-finite as null.
               ROUND(CAST(SUM(CASE WHEN isfinite(value)
                                    AND abs(value) < 999999999.0
                                   THEN CAST(value AS DECIMAL(18,9)) END)
                          AS DOUBLE), 2)
                 AS sum_value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                     AND TIMESTAMP '2262-04-11 00:00:00'
          AND ts >= (SELECT date_trunc('second',
                            MAX(ts) - INTERVAL 3650 DAY)
                     FROM events
                     WHERE ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                                  AND TIMESTAMP '2262-04-11 00:00:00')
        GROUP BY event_type
    """,
    # benchmark contamination: distinct 3-gram leak fraction against the
    # doc_id % 10 == 7 held-out set (same gram extraction as near_dup_3gram)
    "doc_contamination": r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 7),
        stats AS (
          SELECT c.doc_id,
                 COUNT(*) AS n_grams,
                 COUNT(b.shingle) AS n_contaminated
          FROM (SELECT * FROM sh WHERE doc_id % 10 <> 7) c
          LEFT JOIN bench b USING (shingle)
          GROUP BY 1)
        SELECT doc_id,
               CAST(n_grams AS BIGINT)        AS n_grams,
               CAST(n_contaminated AS BIGINT) AS n_contaminated,
               ROUND(n_contaminated / n_grams, 4) AS contamination,
               CAST(n_contaminated / n_grams >= 0.2 AS INT) AS is_contaminated
        FROM stats
    """,
    "events_metric_map": """
        WITH a AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DOUBLE)        AS n_events,
                 SUM(value)                      AS sum_value,
                 AVG(value)                      AS avg_value,
                 CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
          FROM events GROUP BY event_type
        )
        SELECT event_type, metric, ROUND(value, 4) AS value FROM (
          SELECT event_type, 'n_events'  AS metric, n_events  AS value FROM a
          UNION ALL
          SELECT event_type, 'sum_value' AS metric, sum_value AS value FROM a
          UNION ALL
          SELECT event_type, 'avg_value' AS metric, avg_value AS value FROM a
          UNION ALL
          SELECT event_type, 'n_users'   AS metric, n_users   AS value FROM a
        ) WHERE value <> 0.0
    """,
    "sessionize_events": """
        WITH gaps AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                         - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WHERE ts IS NOT NULL  -- no position on a session timeline (r15)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, event_id, ts,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM gaps
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        FROM sess
        GROUP BY user_id, session_id
    """,
    "top_event_per_user": """
        SELECT user_id, event_id, event_type, ROUND(value, 6) AS value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY value DESC, event_id) AS rn
              FROM events)
        WHERE rn = 1
    """,
    # --- scalar functions / grouping sets / subquery shapes --------------
    "scalar_function_showcase": """
        SELECT o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               year(o_orderdate)    AS order_year,
               quarter(o_orderdate) AS order_quarter,
               CAST(DATE '1998-12-31' - CAST(o_orderdate AS DATE) AS BIGINT) AS days_to_eoy,
               upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key,
               -- ROUND only where decimals exist: DuckDB's ROUND
               -- drifts ulps at extreme magnitude (r14)
               CASE WHEN abs(o_totalprice - 150000.0) < 1e12
                    THEN ROUND(abs(o_totalprice - 150000.0), 2)
                    ELSE abs(o_totalprice - 150000.0)
               END AS dist_from_150k,
               -- guarded partial-domain scalars (r14): NULL outside
               -- the domain on BOTH engines (DuckDB errors on
               -- sqrt/log10 of negatives and on CAST(ceil(NaN)))
               CASE WHEN isfinite(o_totalprice)
                     AND abs(o_totalprice / 1000.0) < 9.223372036854776e18
                    THEN CAST(ceil(o_totalprice / 1000.0) AS BIGINT)
               END AS price_kilo_ceil,
               CASE WHEN isfinite(o_totalprice) AND o_totalprice >= 0
                    THEN CASE WHEN sqrt(o_totalprice) < 1e12
                              THEN ROUND(sqrt(o_totalprice), 4)
                              ELSE sqrt(o_totalprice) END
               END AS price_sqrt,
               CASE WHEN isfinite(o_totalprice) AND o_totalprice > 0
                    THEN ROUND(log10(o_totalprice), 4)
               END AS price_log10,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders
    """,
    "grouping_sets_revenue": """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               ROUND(SUM(o_totalprice), 2)               AS revenue,
               COUNT(*)                                  AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus),
                                ())
    """,
    "parts_above_brand_avg": """
        SELECT p_partkey, p_brand,
               ROUND(p_retailprice, 2) AS p_retailprice,
               CAST(brand_sum AS DOUBLE) AS brand_sum,
               brand_n
        FROM (SELECT p_partkey, p_brand, p_retailprice, price_d,
                     SUM(price_d) OVER (PARTITION BY p_brand) AS brand_sum,
                     COUNT(*) OVER (PARTITION BY p_brand)     AS brand_n
              FROM (SELECT *, CAST(p_retailprice AS DECIMAL(18,2)) AS price_d
                    FROM part))
        WHERE price_d * brand_n > brand_sum
    """,
    "orders_with_max_item": """
        SELECT l_orderkey AS o_orderkey,
               ROUND(MAX(l_extendedprice), 2) AS max_item,
               ROUND(SUM(l_extendedprice), 2) AS sum_items,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_orderkey
        HAVING COUNT(*) >= 3
           AND ROUND(MAX(l_extendedprice), 2) * COUNT(*) > 3 * ROUND(SUM(l_extendedprice), 2)
    """,
    "order_price_percentiles": """
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 2)  AS p90,
               ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99,
               COUNT(*) AS n_orders
        FROM orders
        WHERE isfinite(o_totalprice)  -- robust-stat domain (r14)
        GROUP BY o_orderstatus
    """,
    "order_item_arrays": """
        SELECT l_orderkey,
               COUNT(*) AS n_items,
               array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), ',') AS qty_csv,
               CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_max,
               array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
        FROM lineitem
        -- bigint cast domain (r14), mirrors the engine's filter
        WHERE isfinite(l_quantity)
          AND abs(l_quantity) < 9.223372036854776e18
        GROUP BY l_orderkey
    """,
    # --- grouped Pandas-UDF surface --------------------------------------
    "events_zscore": """
        SELECT event_id, user_id,
               ROUND(CASE WHEN COUNT(*) OVER w <= 1
                            OR STDDEV_SAMP(value) OVER w = 0
                          THEN 0.0
                          ELSE (value - AVG(value) OVER w)
                               / STDDEV_SAMP(value) OVER w
                     END, 4) AS z
        FROM events
        WHERE isfinite(value) AND abs(value) < 1.3407807929942596e154
        WINDOW w AS (PARTITION BY user_id)
    """,
    "events_median_udaf": """
        SELECT user_id,
               ROUND(MEDIAN(value), 4) AS median_value
        FROM events
        WHERE isfinite(value)
        GROUP BY user_id
    """,
    # --- PII scrub --------------------------------------------------------
    "doc_pii_scrub": r"""
        WITH s AS (
          SELECT doc_id, text,
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g') AS after_email
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(after_email,
                 '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS BIGINT) AS n_phones,
               regexp_replace(after_email,
                 '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
        FROM s
    """,
    # --- parquet store roundtrip -----------------------------------------
    "parquet_roundtrip_daily": """
        SELECT strftime(ts, '%Y-%m-%d') AS log_day,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1
    """,
    # --- SQL front door ---------------------------------------------------
    "sql_market_share": """
        WITH rev AS (
            SELECT n.n_name AS nation,
                   r.r_name AS region,
                   YEAR(o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
        )
        SELECT region, nation, o_year,
               ROUND(SUM(volume), 2) AS nation_volume,
               ROUND(SUM(volume) / SUM(SUM(volume)) OVER (PARTITION BY region, o_year), 6)
                 AS region_share
        FROM rev
        GROUP BY region, nation, o_year
    """,
    # --- time-series gapfill ---------------------------------------------
    "events_gapfill": """
        WITH ev AS (
            -- ts spine domain (r15 hostile-dates sweep): mirrors the
            -- engine's in_ts_spine_domain — the ns-interop envelope,
            -- bounding the data-derived spine at 5.12 M buckets
            SELECT * FROM events
            WHERE ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                         AND TIMESTAMP '2262-04-11 00:00:00'),
        agg AS (
            SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS s
            FROM ev GROUP BY 1, 2),
        bounds AS (
            SELECT MIN(date_trunc('hour', ts)) AS lo,
                   MAX(date_trunc('hour', ts)) AS hi
            FROM ev),
        spine AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
            FROM bounds),
        grid AS (
            SELECT s.bucket_ts, t.event_type
            FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM ev) t)
        SELECT g.bucket_ts, g.event_type,
               COALESCE(a.n, 0) AS n_events,
               COALESCE(a.s, 0.0) AS sum_value,
               COALESCE(last_value(a.s IGNORE NULLS)
                          OVER (PARTITION BY g.event_type ORDER BY g.bucket_ts),
                        0.0) AS locf_sum
        FROM grid g
        LEFT JOIN agg a
          ON a.bucket_ts = g.bucket_ts AND a.event_type = g.event_type
    """,
    # --- streaming batch twins -------------------------------------------
    # Spark F.window buckets are epoch-aligned; floor(epoch/600)*600 is
    # the dialect-neutral equivalent (600 s = 10 min divides both the
    # Unix epoch and any whole-day origin, so alignment is identical).
    "events_tumbling_windows": """
        SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 600) * 600) AS TIMESTAMP)
                 AS window_start,
               CAST(to_timestamp(FLOOR(epoch(ts) / 600) * 600) AS TIMESTAMP)
                 + INTERVAL 10 MINUTE AS window_end,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        -- event-time domain (r15 hostile-dates): mirrors the engine's
        -- in_ts_spine_domain guard against watermark poisoning /
        -- ns-envelope overflow; NULL ts is null-rejected by BETWEEN
        WHERE ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                     AND TIMESTAMP '2262-04-11 00:00:00'
        GROUP BY 1, 2, 3
    """,
    # Sliding windows: every event belongs to exactly window/slide = 2
    # epoch-aligned 5-min-step windows; generate_series unrolls them.
    "events_sliding_windows": """
        WITH wins AS (
          SELECT event_type, value,
                 UNNEST(generate_series(
                   CAST(to_timestamp(FLOOR(epoch(ts) / 300) * 300 - 300) AS TIMESTAMP),
                   CAST(to_timestamp(FLOOR(epoch(ts) / 300) * 300) AS TIMESTAMP),
                   INTERVAL 5 MINUTE)) AS window_start
          FROM events
          -- event-time domain (r15): the events_tumbling_windows rule
          WHERE ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                       AND TIMESTAMP '2262-04-11 00:00:00')
        SELECT window_start,
               window_start + INTERVAL 10 MINUTE AS window_end,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM wins
        GROUP BY 1, 2, 3
    """,
    # stream-stream interval join, batch twin: inclusive [ts, ts+6h]
    "events_interval_join": """
        SELECT e.event_id AS err_id, e.user_id, e.ts AS err_ts,
               c.event_id AS click_id, c.ts AS click_ts
        FROM events e JOIN events c
          ON c.user_id = e.user_id
         AND e.event_type = 'error' AND c.event_type = 'click'
         AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 6 HOUR
    """,
    # Spark session_window: session = maximal run where each event starts
    # < previous event's ts + gap (end-exclusive); end = last ts + gap.
    "events_session_windows": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            -- event-time domain (r15): the events_tumbling_windows rule
            WHERE ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                         AND TIMESTAMP '2262-04-11 00:00:00'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, session_id
    """,
    # --- reshape surface -------------------------------------------------
    "pivot_qty_by_linestatus": """
        SELECT l_returnflag,
               ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_F,
               ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_O
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "unpivot_order_metrics": """
        WITH w AS (
            SELECT o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS sum_price,
                   ROUND(AVG(o_totalprice), 6) AS avg_price,
                   CAST(COUNT(*) AS DOUBLE) AS n_orders
            FROM orders
            GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value FROM w
        UNION ALL
        SELECT o_orderpriority, 'avg_price' AS metric, avg_price AS value FROM w
        UNION ALL
        SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM w
    """,
    "doc_word_explode": r"""
        WITH words AS (
            SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS word
            FROM documents
        )
        SELECT word,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM words
        WHERE word <> ''
        GROUP BY word
        HAVING COUNT(DISTINCT doc_id) >= 100
    """,
    "events_range_join": """
        SELECT e.event_id, COUNT(c.click_ts) AS n_follow
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
        LEFT JOIN (SELECT user_id AS c_user_id, ts AS click_ts FROM events
                   WHERE event_type = 'click') c
          ON c.c_user_id = e.user_id
         AND c.click_ts >= e.ts
         AND c.click_ts < e.ts + INTERVAL 5 MINUTE
        GROUP BY e.event_id
    """,
    "order_price_histogram": """
        SELECT CAST(LEAST(GREATEST(FLOOR(o_totalprice / 30000.0), 0), 19) AS BIGINT) AS bucket,
               COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi,
               ROUND(AVG(o_totalprice), 4) AS mean_price
        FROM orders
        WHERE isfinite(o_totalprice)  -- no real-line bucket otherwise (r14)
        GROUP BY 1
    """,
    # --- embedding dedup (exact baseline of the LSH tier) ----------------
    "embedding_pairs_exact": f"""
        SELECT a.vec_id AS id_a,
               b.vec_id AS id_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4)
                 AS cos
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              >= 0.3
          AND {_FIN_COS_AB}
    """,
    # --- repetition / boilerplate quality signals ------------------------
    "doc_repetition": r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
          WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 2),
        g AS (
          SELECT doc_id, w,
                 list_transform(range(1, len(w)),
                                i -> w[i] || ' ' || w[i+1]) AS g2
          FROM t),
        tc AS (
          SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, UNNEST(w) AS tok FROM t)
          GROUP BY doc_id, tok)
        SELECT g.doc_id,
               ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4)
                 AS distinct_token_ratio,
               ROUND(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 4)
                 AS dup_2gram_frac,
               (SELECT ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4)
                FROM tc WHERE tc.doc_id = g.doc_id) AS top_token_frac
        FROM g
    """,
    # --- UDTF surface ----------------------------------------------------
    "doc_chunks_udtf": r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
          -- empty/whitespace-only text: the UDTF yields no rows (LATERAL
          -- drops the doc); splitting '' here would yield [''] → 1 bogus
          -- chunk. Guard keeps both engines aligned on "no chunks".
          WHERE trim(text) <> '')
        SELECT doc_id,
               CAST(c AS BIGINT) AS chunk_idx,
               array_to_string(w[(c - 1) * 16 + 1 : LEAST(c * 16, len(w))], ' ') AS chunk,
               CAST(LEAST(c * 16, len(w)) - (c - 1) * 16 AS BIGINT) AS n_tokens
        FROM t, UNNEST(range(1, CAST(ceil(len(w) / 16.0) AS INT) + 1)) AS u(c)
    """,
    # --- text analysis ---------------------------------------------------
    "doc_token_stats": r"""
        SELECT doc_id,
               CAST(COALESCE(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')), 0) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_wordpieces,
               CAST(length(text) AS BIGINT) AS n_chars_measured
        FROM documents
    """,
    "doc_quality": r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS DOUBLE)         AS n_tok,
                 CAST(length(text) AS DOUBLE)                                          AS n_chars,
                 CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|to|and|in)\b')) AS DOUBLE) AS n_stop,
                 CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)       AS n_punct
          FROM documents)
        SELECT doc_id,
               CAST(n_tok AS BIGINT)                                                   AS n_tokens,
               ROUND(CASE WHEN n_tok  > 0 THEN n_chars / n_tok  ELSE 0.0 END, 4)       AS mean_token_len,
               ROUND(CASE WHEN n_tok  > 0 THEN n_stop  / n_tok  ELSE 0.0 END, 4)       AS stopword_ratio,
               ROUND(CASE WHEN n_chars> 0 THEN n_punct / n_chars ELSE 0.0 END, 4)      AS punct_ratio,
               ROUND(0.4 * LEAST(n_tok / 100.0, 1.0)
                   + 0.3 * LEAST((CASE WHEN n_tok  > 0 THEN n_stop  / n_tok   ELSE 0.0 END) * 4.0, 1.0)
                   + 0.3 * (1.0 - LEAST((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 10.0, 1.0)), 4)
                                                                                        AS quality
        FROM t
    """,
    "doc_lang_id": r"""
        WITH s AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text), '\b(the|and|is|was|that)\b'))  AS score_en,
                 len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS score_de,
                 len(regexp_extract_all(lower(text), '\b(el|los|las|es|y|que)\b'))  AS score_es,
                 len(regexp_extract_all(lower(text), '\b(le|les|est|et|une|que)\b')) AS score_fr,
                 len(regexp_extract_all(text, '[一-鿿]'))                            AS n_cjk
          FROM documents)
        SELECT doc_id,
               CASE WHEN n_cjk > 0 THEN 'zh'
                    WHEN GREATEST(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
                    WHEN score_en = GREATEST(score_en, score_de, score_es, score_fr) THEN 'en'
                    WHEN score_de = GREATEST(score_en, score_de, score_es, score_fr) THEN 'de'
                    WHEN score_es = GREATEST(score_en, score_de, score_es, score_fr) THEN 'es'
                    ELSE 'fr' END AS pred_lang,
               CAST(score_en AS BIGINT) AS score_en,
               CAST(score_de AS BIGINT) AS score_de,
               CAST(score_es AS BIGINT) AS score_es,
               CAST(score_fr AS BIGINT) AS score_fr
        FROM s
    """,
    "doc_exact_dedup": r"""
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               MIN(doc_id) AS representative,
               COUNT(*)    AS n_copies
        FROM documents
        GROUP BY 1
    """,
    # --- as-of join ------------------------------------------------------
    # ns-envelope participation domain on both sides (r15 hostile-
    # dates): the result's raw timestamps must be representable by
    # every Arrow/pandas consumer, the driver gate included — engine
    # mirror at plans/registry._asof_events_sides
    # NULL-ts purchases are UNION'd in as explicit no-match rows: the
    # engine's `p.ts >= v.ts` can never hold on NULL, but DuckDB's
    # ASOF JOIN sorts NULL as greatest and hands it the user's LAST
    # view (r15 dense-dates finding)
    "purchases_asof_view": """
        SELECT p.event_id, p.ts, p.user_id, p.value,
               v.ts    AS ts_asof,
               v.value AS value_asof
        FROM (SELECT * FROM events WHERE event_type = 'purchase'
                AND ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                           AND TIMESTAMP '2262-04-11 00:00:00') p
        ASOF LEFT JOIN
             (SELECT * FROM events WHERE event_type = 'view'
                AND ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                           AND TIMESTAMP '2262-04-11 00:00:00') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        UNION ALL
        SELECT event_id, ts, user_id, value,
               NULL AS ts_asof, NULL AS value_asof
        FROM events WHERE event_type = 'purchase' AND ts IS NULL
    """,
    # identical semantics to purchases_asof_view ON the Arrow ns
    # envelope, via the cogrouped applyInPandas merge_asof path — the
    # kernel crosses the Arrow boundary, so out-of-envelope instants
    # are excluded on both sides (r15 hostile-dates; engine mirror at
    # operators/pandas_grouped.py asof_join_cogroup). NULL-ts purchases
    # keep their no-match row (p.ts >= v.ts is never true for NULL).
    # NULL-ts purchases UNION'd in as no-match rows, as for
    # purchases_asof_view (DuckDB ASOF sorts NULL greatest — r15)
    "purchases_asof_cogroup": """
        SELECT p.event_id, p.ts, p.user_id, p.value,
               v.ts    AS ts_asof,
               v.value AS value_asof
        FROM (SELECT * FROM events WHERE event_type = 'purchase'
                AND ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                           AND TIMESTAMP '2262-04-11 00:00:00') p
        ASOF LEFT JOIN
             (SELECT * FROM events WHERE event_type = 'view'
                AND ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                           AND TIMESTAMP '2262-04-11 00:00:00') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        UNION ALL
        SELECT event_id, ts, user_id, value,
               NULL AS ts_asof, NULL AS value_asof
        FROM events WHERE event_type = 'purchase' AND ts IS NULL
    """,
    # forward as-of + tolerance: earliest view at-or-after each purchase,
    # nulled when it lies more than 1 day ahead (merge_asof forward
    # semantics; ties at equal ts are inclusive on both engines)
    "purchases_next_view": """
        SELECT p.event_id, p.ts, p.user_id, p.value,
               n.ts    AS ts_next,
               n.value AS value_next
        FROM (SELECT * FROM events WHERE event_type = 'purchase'
                AND (ts IS NULL
                     OR ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                               AND TIMESTAMP '2262-04-11 00:00:00')) p
        LEFT JOIN LATERAL (
          SELECT v.ts, v.value
          FROM events v
          WHERE v.event_type = 'view'
            AND v.ts BETWEEN TIMESTAMP '1677-09-22 00:00:00'
                         AND TIMESTAMP '2262-04-11 00:00:00'
            AND v.user_id = p.user_id
            AND v.ts >= p.ts
            AND v.ts <= p.ts + INTERVAL 1 DAY
          ORDER BY v.ts
          LIMIT 1) n ON TRUE
    """,
    # --- near-dup (exact variant only; hash-based ops are rows-only) -----
    "near_dup_3gram": r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               ROUND(n_common / (na.n_sh + nb.n_sh - n_common), 4) AS jaccard
        FROM common
        JOIN sizes na ON na.doc_id = doc_a
        JOIN sizes nb ON nb.doc_id = doc_b
        WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
    """,
    "doc_tfidf_topk": r"""
        WITH toks AS (
          SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM toks WHERE term <> '' GROUP BY 1, 2),
        dfreq AS (
          SELECT term, COUNT(DISTINCT doc_id) AS df
          FROM toks WHERE term <> '' GROUP BY 1),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 tf.tf * (LN((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS s,
                 ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * (LN((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) DESC,
                            tf.term) AS rn
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, df, ROUND(s, 4) AS tfidf, rn
        FROM scored WHERE rn <= 5
    """,
    "near_dup_clusters": r"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_a, doc_b
          FROM common
          JOIN sizes na ON na.doc_id = doc_a
          JOIN sizes nb ON nb.doc_id = doc_b
          WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        canon AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS canon_id FROM reach GROUP BY u)
        SELECT d.doc_id,
               CAST(COALESCE(c.canon_id, d.doc_id) AS BIGINT) AS canon_id
        FROM documents d LEFT JOIN canon c USING (doc_id)
    """,
    # dedup materialization: kept representatives (canonical member per
    # cluster) + cluster size — canon per the same recursive closure as
    # near_dup_clusters
    "doc_dedup_keep": r"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_a, doc_b
          FROM common
          JOIN sizes na ON na.doc_id = doc_a
          JOIN sizes nb ON nb.doc_id = doc_b
          WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        canon AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS canon_id FROM reach GROUP BY u),
        assign AS (
          SELECT d.doc_id,
                 CAST(COALESCE(c.canon_id, d.doc_id) AS BIGINT) AS canon_id
          FROM documents d LEFT JOIN canon c USING (doc_id))
        SELECT canon_id AS doc_id, COUNT(*) AS cluster_size
        FROM assign
        GROUP BY canon_id
    """,
    # --- exact-decimal arithmetic ----------------------------------------
    # integer-scaled DECIMAL sums are exact on both engines; the trailing
    # CAST to DOUBLE only renders the identical exact value
    "decimal_revenue_exact": """
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price_exact,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                    AS DOUBLE) AS sum_disc_price_exact,
               COUNT(*) AS n_rows
        FROM lineitem
        -- decimal-exact domain (r14), mirrors the engine's filter
        WHERE isfinite(l_extendedprice)
          AND abs(l_extendedprice) < 999999999999999.0
          AND isfinite(l_discount)
          AND abs(l_discount) < 99999999999999.0
        GROUP BY l_returnflag
    """,
    # --- int8 quantization ------------------------------------------------
    # floor(x/scale + 0.5) spelled out on both engines: CAST/round()
    # half-way behavior differs across engines, floor of a double doesn't
    # non-finite contract mirrored from quantize_int8 (r14): a vector
    # with any NaN/±Inf element reads scale = NULL, codes = NULL.
    # NULL-STRICT (r15 ADVICE): the predicate is `isfinite(x) IS NOT
    # TRUE`, not `NOT isfinite(x)` — list_filter drops NULL-predicate
    # elements, so the loose spelling would read a NULL-element vector
    # as finite and emit codes, while the engine's F.forall yields NULL
    # (→ NULL scale/codes) for the same vector.
    "embedding_quantize_int8": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 len(list_filter(CAST(embedding AS DOUBLE[]),
                                 x -> isfinite(x) IS NOT TRUE)) = 0 AS fin
          FROM embeddings),
        s AS (
          SELECT vec_id, e, fin,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
          FROM v)
        SELECT vec_id,
               CASE WHEN fin THEN ROUND(scale, 6) END AS scale,
               CASE WHEN fin THEN array_to_string(
                 list_transform(e, x -> CAST(CASE WHEN scale > 0
                                                  THEN floor(x / scale + 0.5)
                                                  ELSE 0 END AS INT)), ',')
               END AS codes
        FROM s
    """,
    # serving path over the quantized codes: integer dot (exact) times
    # the two scales; same floor(x/scale + 0.5) quantizer as above.
    # Non-finite vectors carry NULL codes (the quantize_int8 contract)
    # and are excluded from ranking on both sides.
    "ann_quantized_topk": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          WHERE len(list_filter(CAST(embedding AS DOUBLE[]),
                                x -> isfinite(x) IS NOT TRUE)) = 0),
        s AS (
          SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
          FROM v),
        c AS (
          SELECT vec_id, scale,
                 list_transform(e, x -> CAST(CASE WHEN scale > 0
                                                  THEN floor(x / scale + 0.5)
                                                  ELSE 0 END AS BIGINT)) AS codes
          FROM s),
        q AS (SELECT codes AS q_codes, scale AS q_scale FROM c WHERE vec_id = 0)
        SELECT c.vec_id,
               ROUND(list_dot_product(CAST(c.codes AS DOUBLE[]),
                                      CAST(q.q_codes AS DOUBLE[]))
                     * c.scale * q.q_scale, 4) AS score
        FROM c, q
        WHERE c.vec_id <> 0
        ORDER BY score DESC, c.vec_id
        LIMIT 10
    """,
    # --- similarity ------------------------------------------------------
    "embedding_norms": """
        SELECT label,
               COUNT(*) AS n_vectors,
               ROUND(AVG(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
        FROM embeddings
        GROUP BY label
    """,
    "cosine_topk_bruteforce": f"""
        SELECT b.vec_id,
               ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                            CAST(a.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a, embeddings b
        WHERE a.vec_id = 0 AND b.vec_id <> 0
          AND {_FIN_COS_AB}
        ORDER BY cos DESC, b.vec_id
        LIMIT 10
    """,
    "cosine_topk_multi_query": f"""
        SELECT q_id, vec_id, cos, rn FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
                 ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                              CAST(a.embedding AS DOUBLE[])), 4) AS cos,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                    ORDER BY ROUND(list_cosine_similarity(
                                      CAST(b.embedding AS DOUBLE[]),
                                      CAST(a.embedding AS DOUBLE[])), 4) DESC,
                                    b.vec_id) AS rn
          FROM embeddings a, embeddings b
          WHERE a.vec_id IN (0, 1, 2) AND b.vec_id <> a.vec_id
            AND {_FIN_COS_AB}
        ) WHERE rn <= 5
    """,
    # the full curation pipeline's stage funnel: quality gate (the
    # doc_quality score fragment) → md5 exact dedup → exact-Jaccard
    # transitive-closure near dedup (the near_dup_clusters fragment,
    # restricted to exact-dedup survivors). Same LSH-recall coupling as
    # near_dup_clusters: the Spark side clusters via MinHash-LSH pairs.
    "doc_curation_funnel": """
        WITH RECURSIVE
        q AS (
          SELECT doc_id, text,
                 ROUND(0.4 * LEAST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0)
                     + 0.3 * LEAST((CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                                         THEN CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|to|and|in)\\b')) AS DOUBLE)
                                            / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
                                         ELSE 0.0 END) * 4.0, 1.0)
                     + 0.3 * (1.0 - LEAST((CASE WHEN length(text) > 0
                                                THEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                                                   / CAST(length(text) AS DOUBLE)
                                                ELSE 0.0 END) * 10.0, 1.0)), 4) AS quality
          FROM documents),
        passed AS (SELECT doc_id, text FROM q WHERE quality >= 0.3),
        keep_exact AS (SELECT MIN(doc_id) AS doc_id FROM passed GROUP BY md5(text)),
        exact_kept AS (SELECT p.doc_id, p.text FROM passed p JOIN keep_exact USING (doc_id)),
        toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM exact_kept),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_a, doc_b
          FROM common
          JOIN sizes na ON na.doc_id = doc_a
          JOIN sizes nb ON nb.doc_id = doc_b
          WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        canon AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS canon_id FROM reach GROUP BY u),
        survivors AS (
          SELECT d.doc_id FROM exact_kept d LEFT JOIN canon c USING (doc_id)
          WHERE COALESCE(c.canon_id, d.doc_id) = d.doc_id)
        SELECT '1_raw' AS stage, COUNT(*) AS n_docs FROM documents
        UNION ALL SELECT '2_quality_gate', COUNT(*) FROM passed
        UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM exact_kept
        UNION ALL SELECT '4_near_dedup_scrubbed', COUNT(*) FROM survivors
    """,
    "events_zorder_roundtrip": """
        SELECT event_type,
               COUNT(*)                              AS n_events,
               -- decimal-exact sum: order-free (r15, the
               -- kinesis_exactly_once_rollup cent-boundary finding);
               -- domain mirrors the engine's in_decimal_domain
               ROUND(CAST(SUM(CASE WHEN isfinite(value)
                                    AND abs(value) < 999999999.0
                                   THEN CAST(value AS DECIMAL(18,9)) END)
                          AS DOUBLE), 2)             AS sum_value,
               COUNT(DISTINCT user_id)               AS n_users,
               CAST(MIN(event_id) AS BIGINT)         AS min_event_id,
               CAST(MAX(event_id) AS BIGINT)         AS max_event_id
        FROM events
        GROUP BY event_type
    """,
    # --- corpus-level curation (operators/corpus.py) ---------------------
    "doc_unigram_logprob": r"""
        WITH toks AS (
          SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM documents),
        t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        model AS (SELECT term, COUNT(*) AS c FROM t2 GROUP BY 1),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM model)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT)            AS n_tokens,
               ROUND(AVG(LN(c / total)), 4)        AS avg_logprob,
               ROUND(EXP(-AVG(LN(c / total))), 4)  AS ppl_proxy
        FROM t2 JOIN model USING (term) CROSS JOIN n
        GROUP BY doc_id
    """,
    # add-k bigram LM (k=0.5): per-bigram log-ratios ROUND(·,9)-quantized
    # and summed as DECIMAL(18,9) (order-free), ONE double division at
    # the edge; CAST(0.5 AS DOUBLE) everywhere — bare 0.5 parses as
    # DECIMAL with engine-specific division scales (the r7 idf lesson)
    "doc_bigram_logprob": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             t -> t <> '') AS w
          FROM documents),
        pairs AS (
          SELECT doc_id,
                 w[CAST(t.i AS INT)] AS w1, w[CAST(t.i AS INT) + 1] AS w2
          FROM toks, UNNEST(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2),
        big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
                FROM pairs GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a
                FROM big GROUP BY 1),
        vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
                  FROM (SELECT UNNEST(w) AS term FROM toks)),
        scored AS (
          SELECT p.doc_id,
                 CAST(ROUND(LN((CAST(c_ab AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       / (CAST(c_a AS DOUBLE)
                          + CAST(0.5 AS DOUBLE) * CAST(v AS DOUBLE))), 9)
                   AS DECIMAL(18,9)) AS c
          FROM pairs p JOIN big USING (w1, w2) JOIN ctx USING (w1)
          CROSS JOIN vocab)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 4) AS avg_logprob,
               ROUND(EXP(-(CAST(SUM(c) AS DOUBLE) / COUNT(*))), 4)
                 AS ppl_proxy
        FROM scored GROUP BY doc_id
    """,
    "doc_source_quota": """
        SELECT doc_id, source,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS quota_rank,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY n_chars DESC, doc_id ASC) <= 10 AS INT) AS kept
        FROM documents
    """,
    "doc_mixture_sample": r"""
        WITH sized AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT)
                   AS n_tokens,
                 CAST(400 + 50 * (CAST(substr(source, 4) AS INT) % 4) AS BIGINT)
                   AS budget
          FROM documents),
        cum AS (
          SELECT doc_id, source, n_tokens, budget,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM sized)
        SELECT doc_id, source, n_tokens, cum_tokens, budget
        FROM cum WHERE cum_tokens <= budget
    """,
    "doc_quality_sample": r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS DOUBLE)         AS n_tok,
                 CAST(length(text) AS DOUBLE)                                          AS n_chars,
                 CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|to|and|in)\b')) AS DOUBLE) AS n_stop,
                 CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)       AS n_punct
          FROM documents),
        scored AS (
          SELECT doc_id,
                 ROUND(0.4 * LEAST(n_tok / 100.0, 1.0)
                     + 0.3 * LEAST((CASE WHEN n_tok  > 0 THEN n_stop  / n_tok   ELSE 0.0 END) * 4.0, 1.0)
                     + 0.3 * (1.0 - LEAST((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 10.0, 1.0)), 4)
                   AS quality,
                 ROUND(((CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 + 4294967296) % 4294967296 % 10000) / 10000.0, 4) AS coin
          FROM t)
        SELECT doc_id, quality, coin FROM scored WHERE coin < quality
    """,
    "doc_dup_span_stats": r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
        pg AS (
          SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        per AS (
          SELECT doc_id, gram, COUNT(*) AS c FROM pg GROUP BY 1, 2),
        tot AS (
          SELECT gram, CAST(SUM(c) AS BIGINT) AS total FROM per GROUP BY 1)
        SELECT per.doc_id,
               CAST(SUM(c) AS BIGINT) AS n_positions,
               CAST(SUM(CASE WHEN total >= 2 THEN c ELSE 0 END) AS BIGINT)
                 AS n_dup_positions,
               ROUND(SUM(CASE WHEN total >= 2 THEN c ELSE 0 END)
                     / SUM(c), 4) AS dup_frac
        FROM per JOIN tot USING (gram)
        GROUP BY per.doc_id
    """,
    "doc_gram_novelty": r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 3),
        first AS (
          SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT)                              AS n_grams,
               CAST(SUM(CASE WHEN first.first_doc = sh.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT)           AS n_novel,
               ROUND(SUM(CASE WHEN first.first_doc = sh.doc_id
                              THEN 1 ELSE 0 END) / COUNT(*), 4)      AS novelty
        FROM sh JOIN first USING (shingle)
        GROUP BY sh.doc_id
    """,
    "doc_block_dedup": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             t -> t <> '') AS w
          FROM documents),
        blk AS (
          SELECT doc_id, CAST(t.i AS BIGINT) AS block_idx,
                 array_to_string(w[t.i*16+1 : t.i*16+16], ' ') AS block
          FROM toks,
               UNNEST(range(CAST(ceil(len(w) / 16.0) AS BIGINT))) AS t(i)),
        ranked AS (
          SELECT doc_id, block_idx, block,
                 ROW_NUMBER() OVER (PARTITION BY block
                                    ORDER BY doc_id, block_idx) AS rn
          FROM blk),
        kept AS (
          SELECT doc_id, block_idx, block FROM ranked WHERE rn = 1),
        nb AS (
          SELECT doc_id, CAST(ceil(len(w) / 16.0) AS BIGINT) AS n_blocks
          FROM toks)
        SELECT nb.doc_id,
               nb.n_blocks,
               CAST(COUNT(k.block_idx) AS BIGINT) AS n_kept,
               COALESCE(string_agg(k.block, ' ' ORDER BY k.block_idx), '')
                 AS dedup_text
        FROM nb LEFT JOIN kept k USING (doc_id)
        GROUP BY nb.doc_id, nb.n_blocks
    """,
    "doc_decontaminate": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             t -> t <> '') AS w
          FROM documents WHERE doc_id % 10 <> 7),
        bm AS (
          SELECT DISTINCT w2[CAST(t.i AS INT)] || ' ' ||
                          w2[CAST(t.i AS INT) + 1] || ' ' ||
                          w2[CAST(t.i AS INT) + 2] AS gram
          FROM (SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   t -> t <> '') AS w2
                FROM documents WHERE doc_id % 10 = 7),
               UNNEST(range(1, len(w2) - 1)) AS t(i)
          WHERE len(w2) >= 3),
        blk AS (
          SELECT doc_id, CAST(t.i AS BIGINT) AS block_idx,
                 array_to_string(w[t.i*8+1 : t.i*8+8], ' ') AS block
          FROM toks,
               UNNEST(range(CAST(ceil(len(w) / 8.0) AS BIGINT))) AS t(i)),
        bg AS (
          SELECT doc_id, block_idx,
                 bw[CAST(t.i AS INT)] || ' ' ||
                 bw[CAST(t.i AS INT) + 1] || ' ' ||
                 bw[CAST(t.i AS INT) + 2] AS gram
          FROM (SELECT doc_id, block_idx, string_split(block, ' ') AS bw
                FROM blk),
               UNNEST(range(1, len(bw) - 1)) AS t(i)
          WHERE len(bw) >= 3),
        cont AS (
          SELECT DISTINCT bg.doc_id, bg.block_idx
          FROM bg JOIN bm USING (gram)),
        kept AS (
          SELECT b.doc_id, b.block_idx, b.block
          FROM blk b
          ANTI JOIN cont c
            ON b.doc_id = c.doc_id AND b.block_idx = c.block_idx),
        nb AS (
          SELECT doc_id, CAST(ceil(len(w) / 8.0) AS BIGINT) AS n_blocks
          FROM toks)
        SELECT nb.doc_id,
               nb.n_blocks,
               CAST(COUNT(k.block_idx) AS BIGINT) AS n_kept,
               COALESCE(string_agg(k.block, ' ' ORDER BY k.block_idx), '')
                 AS dedup_text
        FROM nb LEFT JOIN kept k USING (doc_id)
        GROUP BY nb.doc_id, nb.n_blocks
    """,
    "doc_global_shuffle": """
        WITH keyed AS (
          SELECT doc_id,
                 CAST(((CAST(doc_id AS HUGEINT) * 2654435761 + 42) % 4294967296 + 4294967296) % 4294967296 AS BIGINT)
                   AS sort_key
          FROM documents)
        SELECT doc_id,
               CAST(sort_key % 8 AS BIGINT) AS shard,
               sort_key,
               CAST(ROW_NUMBER() OVER (PARTITION BY sort_key % 8
                                       ORDER BY sort_key, doc_id) AS BIGINT)
                 AS pos
        FROM keyed
    """,
    "doc_collocations": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             t -> t <> '') AS w
          FROM documents),
        pairs AS (
          SELECT w[CAST(t.i AS INT)] AS w1, w[CAST(t.i AS INT) + 1] AS w2
          FROM toks, UNNEST(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2),
        big AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM pairs GROUP BY 1, 2),
        uni AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT unnest(w) AS term FROM toks) GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(c_ab) AS BIGINT) AS n_big FROM big)
        SELECT b.w1, b.w2, b.c_ab, ua.c AS c_a, ub.c AS c_b,
               ROUND(CAST(b.c_ab AS DOUBLE) * CAST(t.n_big AS DOUBLE)
                     / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)), 4)
                 AS lift
        FROM big b
        JOIN uni ua ON ua.term = b.w1
        JOIN uni ub ON ub.term = b.w2
        CROSS JOIN tot t
        WHERE b.c_ab >= 5
        ORDER BY lift DESC, b.w1, b.w2
        LIMIT 20
    """,
    "matryoshka_topk": f"""
        WITH q AS (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        s1 AS (
          SELECT b.vec_id, b.embedding, q.qv,
                 ROUND(list_cosine_similarity(
                         CAST(b.embedding[1:16] AS DOUBLE[]),
                         CAST(q.qv[1:16] AS DOUBLE[])), 4) AS cos_pref
          FROM embeddings b, q
          WHERE b.vec_id <> 0
            AND {_fin_cos("CAST(b.embedding[1:16] AS DOUBLE[])",
                          "CAST(q.qv[1:16] AS DOUBLE[])")}
          ORDER BY cos_pref DESC, b.vec_id
          LIMIT 40)
        SELECT vec_id, cos_pref,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(qv AS DOUBLE[])), 4)
                 AS cos_full
        FROM s1
        WHERE {_fin_cos("CAST(embedding AS DOUBLE[])", "CAST(qv AS DOUBLE[])")}
        ORDER BY cos_full DESC, vec_id
        LIMIT 10
    """,
    "multimodal_asset_dedup": """
        SELECT md5(text) AS checksum,
               CAST(MIN(doc_id) AS BIGINT) AS keep_asset_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    # --- multimodal (scalar face of the Arrow UDF) -----------------------
    "multimodal_features": """
        SELECT doc_id AS asset_id,
               'image' AS modality,
               -- encode(), not CAST(.. AS BLOB): the cast REJECTS
               -- non-ascii bytes (r14 string-axis sweep) while encode
               -- yields the UTF-8 bytes Spark's octet_length counts
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum
        FROM documents
    """,
}


# --- subword tokenizer (vocabulary shared with functions/subword.py) -----
# The greedy longest-match scan is replayed by the same join-driven
# recursion as doc_pack_sequences: `best` precomputes the longest piece
# match per (word, position, class) NON-recursively (plain join + GROUP
# BY), then the recursion walks each word position→position+blen; a word
# whose walk dies mid-word (no piece at some position) never reaches
# pos = len(word) and degrades to 1 [UNK] token via the LEFT JOIN.
from cloudfront_kinesis_log_lambda_spark.functions.subword import (  # noqa: E402
    MAX_WORD_CHARS,
    vocab_values_sql as _vocab_values_sql,
)

ORACLE_SQL["doc_subword_tokens"] = rf"""
    WITH RECURSIVE vocab AS (
      SELECT piece,
             CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS body,
             (piece LIKE '##%') AS cont
      FROM (VALUES {_vocab_values_sql()}) v(piece)),
    words AS (
      SELECT doc_id, w AS word
      FROM (SELECT doc_id,
                   UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
            FROM documents)
      WHERE len(w) > 0),
    wcount AS (SELECT doc_id, word, COUNT(*) AS n FROM words GROUP BY 1, 2),
    dwords AS (SELECT DISTINCT word FROM wcount),
    -- BERT's max_input_chars_per_word rule (subword.MAX_WORD_CHARS,
    -- r14): over-length words are [UNK] via the LEFT JOIN below and
    -- never enter the per-position recursion (a single 10k-char token
    -- otherwise costs a 10k-deep recursive scan)
    scanw AS (SELECT word FROM dwords WHERE len(word) <= {MAX_WORD_CHARS}),
    positions AS (
      SELECT word, CAST(UNNEST(range(0, len(word))) AS INT) AS pos FROM scanw),
    best AS (
      SELECT p.word, p.pos, v.cont, MAX(len(v.body)) AS blen
      FROM positions p JOIN vocab v
        ON substr(p.word, p.pos + 1, len(v.body)) = v.body
      GROUP BY 1, 2, 3),
    tok(word, pos, n_pieces) AS (
      SELECT word, 0, 0 FROM scanw
      UNION ALL
      SELECT t.word, t.pos + b.blen, t.n_pieces + 1
      FROM tok t JOIN best b
        ON b.word = t.word AND b.pos = t.pos AND b.cont = (t.pos > 0)
      WHERE t.pos < len(t.word)),
    done AS (SELECT word, n_pieces FROM tok WHERE pos = len(word)),
    wordtok AS (
      SELECT d.word,
             CAST(COALESCE(dn.n_pieces, 1) AS BIGINT) AS n_pieces,
             (dn.word IS NULL) AS is_unk
      FROM dwords d LEFT JOIN done dn USING (word))
    SELECT w.doc_id,
           CAST(SUM(w.n) AS BIGINT) AS n_words,
           CAST(SUM(w.n * t.n_pieces) AS BIGINT) AS n_subword_tokens,
           CAST(SUM(CASE WHEN t.is_unk THEN w.n ELSE 0 END) AS BIGINT)
             AS n_unk_words
    FROM wcount w JOIN wordtok t USING (word)
    GROUP BY 1
"""

# --- deterministic sketches (hash/estimator fragments shared with ---------
# --- operators/sketch.py — parity by construction) ------------------------
from cloudfront_kinesis_log_lambda_spark.operators.sketch import (  # noqa: E402
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    hll_bucket_sql_duck,
    hll_estimate_sql,
    hll_h2_sql_duck,
    hll_rho_sql,
    md5_hash_sql_duck,
)

ORACLE_SQL["events_hll_users"] = f"""
    WITH hashed AS (
      SELECT event_type,
             {hll_bucket_sql_duck('user_id')} AS bucket,
             {hll_h2_sql_duck('user_id')}     AS h2
      FROM events WHERE user_id IS NOT NULL),
    keyed AS (
      SELECT event_type, bucket, {hll_rho_sql('h2')} AS rho FROM hashed),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM keyed GROUP BY 1, 2),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT)  AS n_registers,
             SUM(POWER(2.0, -rho))     AS s
      FROM regs GROUP BY 1)
    SELECT event_type, n_registers,
           CAST({HLL_M} - n_registers AS BIGINT) AS v_zero,
           ROUND({hll_estimate_sql('n_registers', 's')}, 4) AS approx_distinct
    FROM agg
"""

ORACLE_SQL["events_hll_daily_merge"] = f"""
    WITH hashed AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {hll_bucket_sql_duck('user_id')} AS bucket,
             {hll_h2_sql_duck('user_id')}     AS h2
      FROM events WHERE user_id IS NOT NULL),
    keyed AS (
      SELECT event_type, day, bucket, {hll_rho_sql('h2')} AS rho
      FROM hashed),
    daily AS (
      SELECT event_type, day, bucket, MAX(rho) AS rho
      FROM keyed GROUP BY 1, 2, 3),
    merged AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM daily GROUP BY 1, 2),
    days AS (
      SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM daily GROUP BY 1),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT)  AS n_registers,
             SUM(POWER(2.0, -rho))     AS s
      FROM merged GROUP BY 1)
    SELECT a.event_type, d.n_days, a.n_registers,
           CAST({HLL_M} - a.n_registers AS BIGINT) AS v_zero,
           ROUND({hll_estimate_sql('a.n_registers', 'a.s')}, 4)
             AS approx_distinct
    FROM agg a JOIN days d ON a.event_type = d.event_type
"""

_CMS_CELLS = "\n      UNION ALL\n".join(
    f"      SELECT word, n_exact, {r} AS r, "
    f"{md5_hash_sql_duck('word', r)} % {CMS_WIDTH} AS col FROM wc"
    for r in range(CMS_DEPTH)
)
ORACLE_SQL["word_countmin_topk"] = rf"""
    WITH toks AS (
      SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS word
      FROM documents),
    wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM toks WHERE word <> '' GROUP BY 1),
    cells AS (
{_CMS_CELLS}),
    counters AS (
      SELECT r, col, CAST(SUM(n_exact) AS BIGINT) AS cell_n
      FROM cells GROUP BY 1, 2),
    top AS (
      SELECT word, n_exact FROM wc
      ORDER BY n_exact DESC, word ASC LIMIT 20),
    probe AS (
      SELECT t.word, t.n_exact, c.r, c.col
      FROM top t JOIN cells c USING (word))
    SELECT p.word, p.n_exact, CAST(MIN(k.cell_n) AS BIGINT) AS cms_est
    FROM probe p JOIN counters k ON p.r = k.r AND p.col = k.col
    GROUP BY 1, 2
"""

ORACLE_SQL["events_hll_incremental"] = ORACLE_SQL["events_hll_users"]

# --- BPE encode (merge table + replace chain shared with functions/bpe.py) -
from cloudfront_kinesis_log_lambda_spark.functions.bpe import (  # noqa: E402
    FIXED_MERGES,
    bpe_pieces_sql,
)

ORACLE_SQL["doc_bpe_tokens"] = rf"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS word
      FROM documents),
    wcount AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks WHERE word <> '' GROUP BY 1, 2),
    dwords AS (SELECT DISTINCT word FROM wcount),
    pieces AS (
      SELECT word,
             CAST({bpe_pieces_sql('word', FIXED_MERGES, duck=True)} AS BIGINT)
               AS n_pieces
      FROM dwords)
    SELECT w.doc_id,
           CAST(SUM(w.n) AS BIGINT)              AS n_words,
           CAST(SUM(w.n * p.n_pieces) AS BIGINT) AS n_bpe_tokens
    FROM wcount w JOIN pieces p USING (word)
    GROUP BY 1
"""

# --- HLL set algebra + DDSketch quantiles (fragments shared with ----------
# --- operators/sketch.py) -------------------------------------------------
from cloudfront_kinesis_log_lambda_spark.operators.sketch import (  # noqa: E402
    DD_BUCKET_SQL,
    dd_quantile_sql,
)

ORACLE_SQL["events_hll_type_overlap"] = f"""
    WITH hashed AS (
      SELECT event_type,
             {hll_bucket_sql_duck('user_id')} AS bucket,
             {hll_h2_sql_duck('user_id')}     AS h2
      FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')),
    keyed AS (
      SELECT event_type, bucket, {hll_rho_sql('h2')} AS rho FROM hashed),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM keyed GROUP BY 1, 2),
    per AS (
      SELECT event_type,
             ROUND({hll_estimate_sql(
                 'CAST(COUNT(*) AS BIGINT)', "SUM(POWER(2.0, -rho))")}, 4)
               AS est
      FROM regs GROUP BY 1),
    u AS (SELECT bucket, MAX(rho) AS rho FROM regs GROUP BY 1),
    ua AS (
      SELECT ROUND({hll_estimate_sql(
          'CAST(COUNT(*) AS BIGINT)', "SUM(POWER(2.0, -rho))")}, 4)
               AS approx_union
      FROM u)
    SELECT (SELECT est FROM per WHERE event_type = 'view')     AS approx_view,
           (SELECT est FROM per WHERE event_type = 'purchase') AS approx_purchase,
           ua.approx_union,
           ROUND((SELECT est FROM per WHERE event_type = 'view')
                 + (SELECT est FROM per WHERE event_type = 'purchase')
                 - ua.approx_union, 4) AS approx_both
    FROM ua
"""

ORACLE_SQL["events_value_ddsketch"] = f"""
    WITH h AS (
      SELECT event_type, {DD_BUCKET_SQL} AS bucket
      FROM events WHERE value > 0 AND isfinite(value)),
    hist AS (
      SELECT event_type, bucket, COUNT(*) AS n FROM h GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bucket,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM hist)
    SELECT event_type,
           CAST(MAX(total) AS BIGINT) AS n_values,
           {dd_quantile_sql(0.5)}     AS p50,
           {dd_quantile_sql(0.95)}    AS p95,
           {dd_quantile_sql(0.99)}    AS p99
    FROM cum GROUP BY 1
"""

ORACLE_SQL["word_countmin_incremental"] = ORACLE_SQL["word_countmin_topk"]

# --- weighted sampling (key fragment shared with operators/reshape.py) ----
from cloudfront_kinesis_log_lambda_spark.operators.reshape import (  # noqa: E402
    WEIGHTED_SAMPLE_K,
    weighted_sample_key_sql,
)

ORACLE_SQL["doc_weighted_sample"] = f"""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           {weighted_sample_key_sql('doc_id', 'n_chars', duck=True)}
             AS sample_key
    FROM documents WHERE n_chars > 0
    ORDER BY sample_key DESC, doc_id ASC LIMIT {WEIGHTED_SAMPLE_K}
"""

ORACLE_SQL["doc_weighted_sample_incremental"] = ORACLE_SQL["doc_weighted_sample"]

ORACLE_SQL["events_ddsketch_incremental"] = ORACLE_SQL["events_value_ddsketch"]

# --- retrieval: BM25 / inverted index / fuzzy matching (r7) ---------------
# Constants imported from the operator modules so query and oracle can
# never drift. Float-literal discipline: every scalar in the BM25 chain
# is DOUBLE before any division (bare decimal literals divide at
# DECIMAL scale on both engines — the r7 idf-drift lesson); per-term
# contributions are ROUND(·,9)-quantized and summed as DECIMAL(18,9)
# (exact, order-free), rendered to DOUBLE only at the end.
from cloudfront_kinesis_log_lambda_spark.operators.retrieval import (  # noqa: E402
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    BM25_TOPK,
    FUZZY_DEEP_PREFIX,
    FUZZY_MAX_BLOCK,
    FUZZY_MAX_DIST,
    FUZZY_PREFIX,
    INDEX_MIN_DF,
    POSTINGS_K,
)

_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_QUERY)

ORACLE_SQL["doc_bm25_topk"] = rf"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS word
      FROM documents),
    t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY 1),
    scal AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                    CAST(AVG(dl) AS DOUBLE) AS avgdl FROM dl),
    tf AS (SELECT doc_id, word, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM t WHERE word IN ({_BM25_TERMS}) GROUP BY 1, 2),
    dft AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id, dl.dl,
             CAST(ROUND(
               LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * ({BM25_K1} + 1.0)
                 / (tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * (CAST(dl.dl AS DOUBLE) / avgdl))), 9)
               AS DECIMAL(18,9)) AS c
      FROM tf JOIN dl USING (doc_id) JOIN dft USING (word) CROSS JOIN scal)
    SELECT doc_id,
           CAST(MAX(dl) AS BIGINT)  AS doc_len,
           CAST(SUM(c) AS DOUBLE)   AS bm25
    FROM contrib
    GROUP BY doc_id
    ORDER BY SUM(c) DESC, doc_id ASC
    LIMIT {BM25_TOPK}
"""

ORACLE_SQL["doc_inverted_index"] = rf"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS word
      FROM documents),
    t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    tf AS (SELECT word, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    stats AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(tf) AS BIGINT) AS total_tf
              FROM tf GROUP BY 1 HAVING COUNT(*) >= {INDEX_MIN_DF}),
    ranked AS (SELECT word, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY word
                                         ORDER BY tf DESC, doc_id ASC) AS rn
               FROM tf),
    post AS (SELECT word,
                    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
                      AS postings_csv
             FROM ranked WHERE rn <= {POSTINGS_K} GROUP BY word)
    SELECT word, n_docs, total_tf, postings_csv
    FROM stats JOIN post USING (word)
"""

from cloudfront_kinesis_log_lambda_spark.operators.retrieval import (  # noqa: E402
    EVAL_CUTOFF,
    RRF_K0,
    RRF_POOL,
    RRF_QUERY_VEC,
    RRF_TOPK,
)

# Ranking-quality metrics: ranks deterministic (ROUND-4 cosine + id
# tiebreak); DCG/IDCG terms ROUND(·,9)-quantized DECIMAL(18,9) sums
# (order-free); MRR/precision are single exact divisions.
ORACLE_SQL["retrieval_eval_metrics"] = f"""
    WITH qlab AS (
      SELECT label AS qlabel FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}),
    pool AS (
      SELECT b.vec_id,
             ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])), 4)
               AS cos
      FROM embeddings a, embeddings b
      WHERE a.vec_id = {RRF_QUERY_VEC} AND b.vec_id <> {RRF_QUERY_VEC}
        AND {_FIN_COS_AB}
      ORDER BY cos DESC, b.vec_id LIMIT {RRF_POOL}),
    ranked AS (
      SELECT p.vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, p.vec_id ASC)
               AS BIGINT) AS r,
             CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
      FROM pool p JOIN embeddings e USING (vec_id) CROSS JOIN qlab q),
    nrel AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_relevant_total
      FROM embeddings, qlab
      WHERE label = qlabel AND vec_id <> {RRF_QUERY_VEC}),
    agg AS (
      SELECT MAX(CASE WHEN rel = 1
                      THEN 1.0 / CAST(r AS DOUBLE) END) AS mrr_raw,
             CAST(COALESCE(SUM(CASE WHEN r <= {EVAL_CUTOFF}
                                    THEN rel ELSE 0 END), 0)
               AS DOUBLE) / CAST({EVAL_CUTOFF} AS DOUBLE) AS p_at_k,
             COALESCE(SUM(CASE WHEN r <= {EVAL_CUTOFF} AND rel = 1
                      THEN CAST(ROUND(1.0 / (LN(CAST(r AS DOUBLE) + 1.0)
                                             / LN(2.0)), 9)
                             AS DECIMAL(18,9))
                      ELSE CAST(0 AS DECIMAL(18,9)) END),
                      CAST(0 AS DECIMAL(18,9))) AS dcg,
             CAST(COALESCE(SUM(rel), 0) AS BIGINT) AS n_relevant_in_pool
      FROM ranked),
    -- TOTAL edge semantics (mirrors ranking_metrics, r10): exactly one
    -- idcg row even at n_relevant_total = 0 (the old GROUP BY emitted
    -- zero rows there and the cross join vanished the metrics row),
    -- and ndcg NULL when idcg = 0 (0/0 undefined)
    idcg AS (
      SELECT n_relevant_total,
             COALESCE((SELECT SUM(CAST(ROUND(1.0 / (LN(CAST(i AS DOUBLE)
                                                       + 1.0) / LN(2.0)),
                                              9) AS DECIMAL(18,9)))
                       FROM range(1, {EVAL_CUTOFF} + 1) t(i)
                       WHERE i <= LEAST({EVAL_CUTOFF}, n_relevant_total)),
                      CAST(0 AS DECIMAL(18,9))) AS idcg
      FROM nrel)
    SELECT CAST({RRF_POOL} AS BIGINT) AS k,
           n_relevant_total, n_relevant_in_pool,
           ROUND(COALESCE(mrr_raw, 0.0), 6) AS mrr,
           ROUND(p_at_k, 6) AS precision_at_10,
           CASE WHEN idcg > 0
                THEN ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6)
           END AS ndcg_at_10
    FROM agg CROSS JOIN idcg
"""

# Hybrid RRF: the BM25 CTE is doc_bm25_topk's oracle at pool depth;
# the cosine leg is cosine_topk_bruteforce's; fusion is 1/(k0+rank)
# sums of small-int ranks — identical IEEE doubles on both engines.
ORACLE_SQL["doc_hybrid_rrf"] = rf"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS word
      FROM documents),
    t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY 1),
    scal AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                    CAST(AVG(dl) AS DOUBLE) AS avgdl FROM dl),
    tf AS (SELECT doc_id, word, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM t WHERE word IN ({_BM25_TERMS}) GROUP BY 1, 2),
    dft AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * ({BM25_K1} + 1.0)
                 / (tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * (CAST(dl.dl AS DOUBLE) / avgdl))), 9)
               AS DECIMAL(18,9)) AS c
      FROM tf JOIN dl USING (doc_id) JOIN dft USING (word) CROSS JOIN scal),
    bm25 AS (
      SELECT doc_id, SUM(c) AS s FROM contrib GROUP BY doc_id
      ORDER BY SUM(c) DESC, doc_id ASC LIMIT {RRF_POOL}),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC)
               AS BIGINT) AS r_lex
      FROM bm25),
    cosq AS (
      SELECT b.vec_id AS doc_id,
             ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])), 4)
               AS cos
      FROM embeddings a, embeddings b
      WHERE a.vec_id = {RRF_QUERY_VEC} AND b.vec_id <> {RRF_QUERY_VEC}
        AND {_FIN_COS_AB}
      ORDER BY cos DESC, b.vec_id LIMIT {RRF_POOL}),
    sem AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC)
               AS BIGINT) AS r_sem
      FROM cosq)
    SELECT doc_id, r_lex, r_sem,
           ROUND(
             COALESCE(1.0 / ({RRF_K0}.0 + CAST(r_lex AS DOUBLE)), 0.0)
             + COALESCE(1.0 / ({RRF_K0}.0 + CAST(r_sem AS DOUBLE)), 0.0),
             9) AS rrf
    FROM lex FULL OUTER JOIN sem USING (doc_id)
    ORDER BY rrf DESC, doc_id ASC
    LIMIT {RRF_TOPK}
"""

# two-level hot-block cap mirrored from operators/retrieval.py: shallow
# blocks over FUZZY_MAX_BLOCK re-key on the deep prefix; deep blocks
# still over the cap are dropped ('S:'/'D:' keeps key spaces disjoint)
ORACLE_SQL["part_fuzzy_pairs"] = f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    c1 AS (SELECT substr(name, 1, {FUZZY_PREFIX}) AS b1, COUNT(*) AS n1
           FROM names GROUP BY 1),
    keyed AS (
      SELECT name,
             CASE WHEN n1 > {FUZZY_MAX_BLOCK}
                  THEN 'D:' || substr(name, 1, {FUZZY_DEEP_PREFIX})
                  ELSE 'S:' || substr(name, 1, {FUZZY_PREFIX}) END AS blk
      FROM names JOIN c1 ON substr(name, 1, {FUZZY_PREFIX}) = b1),
    c2 AS (SELECT blk, COUNT(*) AS n2 FROM keyed GROUP BY 1),
    ok AS (SELECT name, blk FROM keyed JOIN c2 USING (blk)
           WHERE n2 <= {FUZZY_MAX_BLOCK})
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM ok a JOIN ok b
      ON a.blk = b.blk
     AND a.name < b.name
     AND abs(length(a.name) - length(b.name)) <= {FUZZY_MAX_DIST}
    WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
"""

# --- time series / sequences (r7) -----------------------------------------
# EWMA is a sequential left fold: list_reduce here, the aggregate()
# higher-order function on Spark — both fold IEEE doubles in the same
# order, so the un-rounded results are bit-identical (pinned in
# tests/test_timeseries.py); ROUND(·,6) is belt-and-braces.
from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (  # noqa: E402
    ATTRIBUTION_WINDOW_DAYS,
    CUSUM_H,
    CUSUM_K,
    EWMA_ALPHA,
    HOLT_ALPHA,
    HOLT_BETA,
    HW_ALPHA,
    HW_BETA,
    HW_GAMMA,
    HW_PERIOD,
    MAD_SIGMA,
    TREND_EPOCH_HOURS,
)

ORACLE_SQL["events_ewma"] = f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (a, x) -> a * {1.0 - EWMA_ALPHA!r} +
                                       x * {EWMA_ALPHA!r}), 6) AS ewma
    FROM events
    WHERE ts IS NOT NULL  -- no position in an ordered series (r15)
    GROUP BY user_id
"""

# Holt linear trend. NOT list_reduce: DuckDB 1.0 mutates the
# accumulator struct FIELD-BY-FIELD inside the fold, so a multi-field
# recursion reads its own partially-updated state ('b' sees the new
# 'l' — verified: 4-element fold diverges from the single-step result
# with identical inputs). The oracle replays the fold as a recursive
# CTE instead (the nation_pagerank pattern): all users advance in
# lockstep, one row of (l, b) state per user per step, with the level
# expression textually identical to the Spark lambda
# (operators/timeseries.py::holt_merge_lambda) so the IEEE DAG matches
# step for step.
_HOLT_LVL_CTE = (
    f"{HOLT_ALPHA!r} * arr[i + 1] + {1.0 - HOLT_ALPHA!r} * (l + b)"
)
ORACLE_SQL["events_holt"] = f"""
    WITH RECURSIVE arrs AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS arr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE ts IS NOT NULL  -- no position in an ordered series (r15)
      GROUP BY user_id),
    state AS (
      SELECT user_id, CAST(2 AS BIGINT) AS i,
             CAST(arr[2] AS DOUBLE) AS l,
             CAST(arr[2] - arr[1] AS DOUBLE) AS b,
             arr, n
      FROM arrs WHERE n >= 2
      UNION ALL
      SELECT user_id, i + 1,
             {_HOLT_LVL_CTE},
             {HOLT_BETA!r} * (({_HOLT_LVL_CTE}) - l)
               + {1.0 - HOLT_BETA!r} * b,
             arr, n
      FROM state WHERE i < n),
    fin AS (
      SELECT user_id, n, l, b FROM state WHERE i = n
      UNION ALL
      SELECT user_id, n, CAST(arr[1] AS DOUBLE), CAST(0.0 AS DOUBLE)
      FROM arrs WHERE n = 1)
    SELECT user_id,
           n AS n_events,
           ROUND(l, 6)     AS level,
           ROUND(b, 6)     AS trend,
           ROUND(l + b, 6) AS forecast
    FROM fin
"""

# Holt-Winters additive (hour-of-day seasonal, period 24). Same
# recursive-CTE replay discipline as events_holt — the accumulator is
# now (l, bt, s LIST(24), n); the seasonal list is rebuilt per step
# with 1-based slices (prefix || [updated slot] || suffix — verified:
# s[1:0] and s[26:24] are empty lists, so the edge slots work). The
# level expression is textually duplicated into trend and seasonal
# terms, identical to the Spark lambda
# (operators/timeseries.py::holt_winters_merge_lambda). Hourly series
# values are DECIMAL(18,9)-quantized sums cast to double — order-free
# exactness before the order-dependent fold starts.
_HW_LVL_CTE = (
    f"{HW_ALPHA!r} * (xs[i + 1] - s[ps[i + 1] + 1]) "
    f"+ {1.0 - HW_ALPHA!r} * (l + bt)"
)
ORACLE_SQL["events_holt_winters"] = f"""
    WITH RECURSIVE b AS (
      SELECT event_type, date_trunc('hour', ts) AS hb,
             CAST(SUM(CAST(value AS DECIMAL(18,9))) AS DOUBLE) AS x,
             CAST(EXTRACT(hour FROM date_trunc('hour', ts)) AS BIGINT)
               AS p
      FROM events
      WHERE isfinite(value) AND abs(value) < 999999999.0  -- decimal-exact domain (r14)
        AND ts IS NOT NULL  -- no hourly bucket (r15)
      GROUP BY event_type, date_trunc('hour', ts)),
    arrs AS (
      SELECT event_type,
             list(x ORDER BY hb) AS xs,
             list(p ORDER BY hb) AS ps,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY event_type),
    state AS (
      SELECT event_type, CAST(1 AS BIGINT) AS i,
             CAST(xs[1] AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS bt,
             list_transform(range({HW_PERIOD}),
                            r -> CAST(0.0 AS DOUBLE)) AS s,
             xs, ps, n
      FROM arrs
      UNION ALL
      SELECT event_type, i + 1,
             {_HW_LVL_CTE},
             {HW_BETA!r} * (({_HW_LVL_CTE}) - l)
               + {1.0 - HW_BETA!r} * bt,
             s[1:CAST(ps[i + 1] AS INT)]
               || [{HW_GAMMA!r} * (xs[i + 1] - ({_HW_LVL_CTE}))
                   + {1.0 - HW_GAMMA!r} * s[ps[i + 1] + 1]]
               || s[CAST(ps[i + 1] AS INT) + 2:{HW_PERIOD}],
             xs, ps, n
      FROM state WHERE i < n)
    SELECT event_type,
           n AS n_buckets,
           ROUND(l, 6)  AS level,
           ROUND(bt, 6) AS trend,
           ROUND(s[((ps[n] + 1) % {HW_PERIOD}) + 1], 6) AS season_next,
           ROUND(l + bt + s[((ps[n] + 1) % {HW_PERIOD}) + 1], 6)
             AS forecast
    FROM state WHERE i = n
"""

# Per-type OLS trend. Moment sums are exact (integers + DECIMALs) and
# every decimal stays far under the 2^53 SCALED-UNIT parity bound for
# decimal→double casts (above it DuckDB's int128→double-then-divide
# double-rounds where the JVM rounds once — a verified 1-ulp
# divergence; see events_linear_trend's docstring). The closed form is
# textually identical to operators/timeseries.py::linear_trend_final.
ORACLE_SQL["events_linear_trend"] = f"""
    WITH prep AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 - {TREND_EPOCH_HOURS} AS x,
             CAST(value AS DECIMAL(18,3)) AS yd
      FROM events
      WHERE isfinite(value) AND abs(value) < 999999999999999.0  -- decimal-exact domain (r14)
      ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx,
             SUM(x * x) AS sxx,
             CAST(SUM(yd) AS DECIMAL(28,3)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(10,0)) * yd) AS DECIMAL(38,3))
               AS sxy,
             CAST(SUM(CAST(CAST(yd AS DOUBLE) * CAST(yd AS DOUBLE)
                           AS DECIMAL(24,3))) AS DECIMAL(28,3)) AS syy
      FROM prep GROUP BY event_type),
    f1 AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM agg),
    f2 AS (
      SELECT *,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sx AS DOUBLE) / nd AS den,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sy AS DOUBLE) / nd AS num,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / nd AS syc
      FROM f1)
    SELECT event_type,
           n AS n_events,
           ROUND(CASE WHEN den = 0.0 THEN NULL
                      ELSE num / den END, 6) AS slope_per_hour,
           ROUND(CASE WHEN den = 0.0 THEN NULL
                      ELSE CAST(sy AS DOUBLE) / nd
                           - (num / den) * (CAST(sx AS DOUBLE) / nd)
                 END, 6) AS intercept,
           ROUND(CASE WHEN den = 0.0 OR syc = 0.0 THEN NULL
                      ELSE num * num / (den * syc) END, 6) AS r2
    FROM f2
"""

# Two-sided CUSUM changepoint scan. The 5-field (sp, sn, na, fa, i)
# accumulator forces the recursive-CTE replay (events_holt pattern).
# Baseline mu/sigma derive from DECIMAL-quantized sums of x and x² —
# order-free exact — and the sp/sn step expressions are textually
# identical to operators/timeseries.py::cusum_merge_lambda.
_CUSUM_SP ="GREATEST(CAST(0.0 AS DOUBLE), sp + (xs[i + 1] - mu - ks))"
_CUSUM_SN = "GREATEST(CAST(0.0 AS DOUBLE), sn + (mu - xs[i + 1] - ks))"
_CUSUM_ALARM = f"(({_CUSUM_SP}) > hs OR ({_CUSUM_SN}) > hs)"
ORACLE_SQL["events_cusum_changepoints"] = f"""
    WITH RECURSIVE b AS (
      SELECT event_type, date_trunc('hour', ts) AS hb,
             SUM(CAST(value AS DECIMAL(18,9))) AS xd
      FROM events
      WHERE isfinite(value) AND abs(value) < 999999999.0  -- decimal-exact domain (r14)
        AND ts IS NOT NULL  -- no hourly bucket (r15)
      GROUP BY event_type, date_trunc('hour', ts)),
    b2 AS (
      SELECT event_type, hb, xd, CAST(xd AS DOUBLE) AS x,
             CAST(CAST(xd AS DOUBLE) * CAST(xd AS DOUBLE)
                  AS DECIMAL(28,9)) AS xsq
      FROM b),
    arrs AS (
      SELECT event_type,
             list(x ORDER BY hb) AS xs,
             list(strftime(hb, '%Y-%m-%d %H:00') ORDER BY hb) AS hhs,
             SUM(xd) AS sx, SUM(xsq) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM b2 GROUP BY event_type),
    s1 AS (SELECT *, CAST(sx AS DOUBLE) / n AS mu FROM arrs),
    s2 AS (SELECT *, sqrt(GREATEST(CAST(0.0 AS DOUBLE),
                          CAST(sxx AS DOUBLE) / n - mu * mu)) AS sigma
           FROM s1),
    stats AS (SELECT *, {CUSUM_K!r} * sigma AS ks,
                        {CUSUM_H!r} * sigma AS hs
              FROM s2),
    state AS (
      SELECT event_type, CAST(0 AS BIGINT) AS i,
             CAST(0.0 AS DOUBLE) AS sp, CAST(0.0 AS DOUBLE) AS sn,
             CAST(0 AS BIGINT) AS na, CAST(0 AS BIGINT) AS fa,
             xs, hhs, n, mu, ks, hs
      FROM stats
      UNION ALL
      SELECT event_type, i + 1,
             {_CUSUM_SP},
             {_CUSUM_SN},
             na + CASE WHEN {_CUSUM_ALARM}
                       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END,
             CASE WHEN fa > 0 THEN fa
                  WHEN {_CUSUM_ALARM} THEN i + 1
                  ELSE CAST(0 AS BIGINT) END,
             xs, hhs, n, mu, ks, hs
      FROM state WHERE i < n)
    SELECT event_type,
           n  AS n_buckets,
           na AS n_alarms,
           fa AS first_alarm_idx,
           CASE WHEN fa > 0 THEN hhs[fa] END AS first_alarm_hour,
           ROUND(sp, 6) AS cusum_pos,
           ROUND(sn, 6) AS cusum_neg
    FROM state WHERE i = n
"""

ORACLE_SQL["events_ohlc"] = """
    WITH k AS (
      SELECT event_type, value,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             -- +62135596800000000 = -proleptic-min epoch-us: keeps the
             -- padded key non-negative for every instant (a negative
             -- epoch breaks string order — r15; mirror of
             -- timeseries.PROLEPTIC_MIN_US)
             lpad(CAST(epoch_us(ts) + 62135596800000000 AS VARCHAR),
                  20, '0') ||
               lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
      FROM events
      WHERE ts IS NOT NULL)  -- no hour bucket / open-close order (r15)
    SELECT event_type, hour,
           arg_min(value, k) AS open,
           MAX(value)        AS high,
           MIN(value)        AS low,
           arg_max(value, k) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM k GROUP BY 1, 2
"""

ORACLE_SQL["events_mad_outliers"] = f"""
    WITH med AS (SELECT event_type,
                        ROUND(quantile_cont(value, 0.5), 9) AS med
                 FROM events WHERE isfinite(value) GROUP BY 1),
    dev AS (SELECT e.event_type, med,
                   ROUND(abs(e.value - med), 9) AS adev
            FROM events e JOIN med USING (event_type)
            WHERE isfinite(e.value)),
    mad AS (SELECT event_type, ROUND(quantile_cont(adev, 0.5), 9) AS mad
            FROM dev GROUP BY 1)
    SELECT d.event_type,
           MAX(med) AS median_value,
           MAX(mad) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN adev > {MAD_SIGMA!r} * mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CASE WHEN adev > {MAD_SIGMA!r} * mad
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
    FROM dev d JOIN mad USING (event_type) GROUP BY 1
"""

ORACLE_SQL["events_seasonal_outliers"] = f"""
    WITH e AS (SELECT event_type,
                      CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
                      value
               FROM events WHERE isfinite(value)),
    med AS (SELECT event_type, hod,
                   ROUND(quantile_cont(value, 0.5), 9) AS med
            FROM e GROUP BY 1, 2),
    dev AS (SELECT e.event_type, e.hod, med,
                   ROUND(abs(e.value - med), 9) AS adev
            FROM e JOIN med USING (event_type, hod)),
    mad AS (SELECT event_type, hod,
                   ROUND(quantile_cont(adev, 0.5), 9) AS mad
            FROM dev GROUP BY 1, 2)
    SELECT d.event_type, d.hod,
           MAX(med) AS median_value,
           MAX(mad) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN adev > {MAD_SIGMA!r} * mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CASE WHEN adev > {MAD_SIGMA!r} * mad
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
    FROM dev d JOIN mad USING (event_type, hod) GROUP BY 1, 2
"""

ORACLE_SQL["event_transitions"] = """
    WITH pairs AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
      WHERE ts IS NOT NULL),  -- no adjacency position (r15)
    counts AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE),
                 6) AS prob
    FROM counts
"""

# The streaming twin accumulates the identical matrix (within-batch
# lead pairs + state-bridged boundary pairs; SUM-merge law) — the
# oracle IS the batch query's SQL.
ORACLE_SQL["event_transitions_incremental"] = ORACLE_SQL["event_transitions"]

_TOUCH_US = ATTRIBUTION_WINDOW_DAYS * 86_400_000_000

ORACLE_SQL["attribution_last_touch"] = f"""
    WITH carried AS (
      SELECT user_id, ts, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_ts
      FROM events
      WHERE ts IS NOT NULL),  -- no carry position / convert lag (r15)
    p AS (
      SELECT value,
             CASE WHEN touch_ts IS NOT NULL
                       AND epoch_us(ts) - epoch_us(touch_ts) <= {_TOUCH_US}
                  THEN touch_type ELSE 'none' END AS touch,
             epoch_us(ts) - epoch_us(touch_ts) AS lag_us
      FROM carried WHERE event_type = 'purchase')
    SELECT touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(value), 2)     AS attributed_value,
           ROUND(CAST(SUM(CASE WHEN touch <> 'none' THEN lag_us END)
                      AS DOUBLE)
                 / CAST(SUM(CASE WHEN touch <> 'none' THEN 1 ELSE 0 END)
                        AS DOUBLE)
                 / 3600000000.0, 4) AS avg_hours_to_convert
    FROM p GROUP BY touch
"""

# --- snapshot diff (r7) ---------------------------------------------------
from cloudfront_kinesis_log_lambda_spark.operators.cdc import (  # noqa: E402
    SNAPSHOT_T1,
    SNAPSHOT_T2,
)

_T1 = SNAPSHOT_T1.strftime("%Y-%m-%d %H:%M:%S")
_T2 = SNAPSHOT_T2.strftime("%Y-%m-%d %H:%M:%S")

ORACLE_SQL["customer_rollup_diff"] = f"""
    WITH old AS (
      SELECT o_custkey AS custkey,
             CAST(COUNT(*) AS BIGINT) AS old_n_orders,
             ROUND(SUM(o_totalprice), 2) AS old_total
      FROM orders WHERE o_orderdate < TIMESTAMP '{_T1}' GROUP BY 1),
    new AS (
      SELECT o_custkey AS custkey,
             CAST(COUNT(*) AS BIGINT) AS new_n_orders,
             ROUND(SUM(o_totalprice), 2) AS new_total
      FROM orders WHERE o_orderdate < TIMESTAMP '{_T2}' GROUP BY 1)
    SELECT COALESCE(o.custkey, n.custkey) AS custkey,
           CASE WHEN o.custkey IS NULL THEN 'added'
                WHEN n.custkey IS NULL THEN 'removed'
                WHEN old_n_orders = new_n_orders
                     AND old_total = new_total THEN 'unchanged'
                ELSE 'changed' END AS change_type,
           old_n_orders, new_n_orders, old_total, new_total,
           ROUND(COALESCE(new_total, 0.0) - COALESCE(old_total, 0.0), 2)
             AS delta
    FROM old o FULL OUTER JOIN new n ON o.custkey = n.custkey
"""

# --- graph / blocking / paths (r7 second batch) ---------------------------
from cloudfront_kinesis_log_lambda_spark.operators.dedup import (  # noqa: E402
    SNM_KEY_LEN,
    SNM_MAX_PREFIX_DIST,
    SNM_PREFIX_LEN,
    SNM_WINDOW,
)
from cloudfront_kinesis_log_lambda_spark.operators.graph import (  # noqa: E402
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
    PAGERANK_ROUND,
)
from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (  # noqa: E402
    PATHS_TOPK,
    SESSION_GAP_S,
)

# PageRank replay: the recursive term keeps every node alive with a
# zero-valued self-loop (its 0.0 lands inside the ordered fold — an
# exact IEEE identity, so the fold equals Spark's self-loop-free fold
# bit-for-bit) and per-dst contributions fold in src order via
# list_reduce, mirroring the Spark loop's sort_array+aggregate fold.
ORACLE_SQL["nation_pagerank"] = f"""
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                      CAST(s.s_nationkey AS BIGINT) AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    -- explicit nested dedup: inside a WITH RECURSIVE list DuckDB gives
    -- a bare UNION recursive-union semantics and returns the operands
    -- APPENDED (50 rows for 25 nodes — doubled every rank); a derived
    -- table with DISTINCT is immune
    nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
            FROM edges GROUP BY 1),
    e2 AS (SELECT src, dst, FALSE AS self FROM edges
           UNION ALL SELECT node, node, TRUE FROM nodes),
    pr(it, node, rank) AS (
      SELECT 0, node, CAST(1.0 AS DOUBLE) FROM nodes
      UNION ALL
      SELECT pr.it + 1, e2.dst,
             ROUND({1.0 - PAGERANK_DAMPING!r} + {PAGERANK_DAMPING!r} *
                   list_reduce(
                     list(CASE WHEN e2.self THEN 0.0
                               ELSE pr.rank / deg.deg END
                          ORDER BY e2.src),
                     (a, b) -> a + b), {PAGERANK_ROUND})
      FROM pr
      JOIN e2 ON e2.src = pr.node
      LEFT JOIN deg ON deg.src = pr.node
      WHERE pr.it < {PAGERANK_ITERS}
      GROUP BY pr.it, e2.dst)
    SELECT pr.node AS nationkey, n.n_name,
           CAST(COALESCE(d2.n_out, 0) AS BIGINT) AS n_out,
           pr.rank
    FROM pr
    JOIN nation n ON n.n_nationkey = pr.node
    LEFT JOIN (SELECT src, COUNT(*) AS n_out FROM edges GROUP BY 1) d2
      ON d2.src = pr.node
    WHERE pr.it = {PAGERANK_ITERS}
"""

# Part co-purchase triangle census. Mirrors
# operators/graph.py::triangle_stats structurally: same degree
# orientation (deg, node) total order, same orientation-minimal-corner
# triangle identity, so the integer counts are engine-independent.
# Division spelled CAST(2 AS DOUBLE) * t / (d * (d - 1)) — identical
# IEEE DAG to Spark's 2.0 * t / (d * (d - 1)); bare SQL literals stay
# DECIMAL in DuckDB, hence the explicit casts.
ORACLE_SQL["part_triangle_stats"] = """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
      FROM lineitem),
    edges AS (
      SELECT DISTINCT o1.pk AS a, o2.pk AS b
      FROM op o1 JOIN op o2 ON o1.ok = o2.ok AND o1.pk < o2.pk),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM edges
        UNION ALL SELECT b FROM edges) GROUP BY node),
    oriented AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.a ELSE e.b END AS s,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.b ELSE e.a END AS t,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN db.deg ELSE da.deg END AS dt
      FROM edges e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b),
    tri AS (
      SELECT e1.s AS x, e1.t AS y, e2.t AS z
      FROM oriented e1
      JOIN oriented e2 ON e1.s = e2.s
        AND (e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t))
      JOIN oriented e3 ON e3.s = e1.t AND e3.t = e2.t),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri),
    tc AS (SELECT node, COUNT(*) AS triangles FROM corners GROUP BY node)
    SELECT d.node AS part_key,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles,
           ROUND(CASE WHEN d.deg >= 2
                      THEN CAST(2 AS DOUBLE) * COALESCE(tc.triangles, 0)
                           / (d.deg * (d.deg - 1))
                      ELSE CAST(0 AS DOUBLE) END, 6) AS clustering
    FROM deg d LEFT JOIN tc ON tc.node = d.node
"""

ORACLE_SQL["doc_sorted_neighbors"] = f"""
    WITH keyed AS (
      SELECT doc_id,
             substr(lower(text), 1, {SNM_KEY_LEN}) AS snm_key,
             substr(text, 1, {SNM_PREFIX_LEN})     AS prefix
      FROM documents),
    ranked AS (
      SELECT doc_id, prefix,
             ROW_NUMBER() OVER (ORDER BY snm_key, doc_id) AS rn
      FROM keyed),
    cand AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             levenshtein(a.prefix, b.prefix) AS prefix_dist
      FROM ranked a
      JOIN UNNEST(range(1, {SNM_WINDOW} + 1)) t(i) ON TRUE
      JOIN ranked b ON b.rn = a.rn + t.i)
    SELECT LEAST(da, db)    AS doc_a,
           GREATEST(da, db) AS doc_b,
           CAST(prefix_dist AS INT) AS prefix_dist
    FROM cand WHERE prefix_dist <= {SNM_MAX_PREFIX_DIST}
"""

# two-pass SNM: pass 2 sorts by the lowercased REVERSED-text prefix;
# UNION (not UNION ALL) dedups pairs found by both passes — a pair's
# (doc_a, doc_b, prefix_dist) row is identical in either pass.
ORACLE_SQL["doc_sorted_neighbors_multipass"] = f"""
    WITH keyed AS (
      SELECT doc_id,
             substr(lower(text), 1, {SNM_KEY_LEN})          AS k1,
             substr(lower(reverse(text)), 1, {SNM_KEY_LEN}) AS k2,
             substr(text, 1, {SNM_PREFIX_LEN})              AS prefix
      FROM documents),
    r1 AS (SELECT doc_id, prefix,
                  ROW_NUMBER() OVER (ORDER BY k1, doc_id) AS rn
           FROM keyed),
    r2 AS (SELECT doc_id, prefix,
                  ROW_NUMBER() OVER (ORDER BY k2, doc_id) AS rn
           FROM keyed),
    cand AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             levenshtein(a.prefix, b.prefix) AS prefix_dist
      FROM r1 a
      JOIN UNNEST(range(1, {SNM_WINDOW} + 1)) t(i) ON TRUE
      JOIN r1 b ON b.rn = a.rn + t.i
      UNION
      SELECT a.doc_id, b.doc_id, levenshtein(a.prefix, b.prefix)
      FROM r2 a
      JOIN UNNEST(range(1, {SNM_WINDOW} + 1)) t(i) ON TRUE
      JOIN r2 b ON b.rn = a.rn + t.i)
    SELECT DISTINCT
           LEAST(da, db)    AS doc_a,
           GREATEST(da, db) AS doc_b,
           CAST(prefix_dist AS INT) AS prefix_dist
    FROM cand WHERE prefix_dist <= {SNM_MAX_PREFIX_DIST}
"""

ORACLE_SQL["top_conversion_paths"] = f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT)
                       > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WHERE ts IS NOT NULL  -- no position on a session timeline (r15)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM gaps
    ), paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths WHERE converted = 1
    GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT {PATHS_TOPK}
"""

# Candle merge laws are commutative (MIN/MAX/argmin-by-key/SUM), so the
# streaming store reproduces the batch candles exactly — the oracle IS
# events_ohlc's SQL.
ORACLE_SQL["events_ohlc_incremental"] = ORACLE_SQL["events_ohlc"]

# EWMA left-folds compose (fold(full) == fold(tail, seed=fold(head))),
# so the time-ordered wave replay reproduces the batch fold bit-exactly
# — the oracle IS events_ewma's SQL.
ORACLE_SQL["events_ewma_incremental"] = ORACLE_SQL["events_ewma"]

# Holt's (l, b, n) accumulator composes the same way (shared merge
# lambda) — the oracle IS events_holt's recursive-CTE SQL.
ORACLE_SQL["events_holt_incremental"] = ORACLE_SQL["events_holt"]

# Holt-Winters folds over CLOSED hourly buckets with the open hour's
# decimal partial composing across batches, and the serve step folds
# the open hour on read — so the wave replay equals the batch fold
# bit-for-bit and the oracle IS events_holt_winters's recursive CTE.
ORACLE_SQL["events_holt_winters_incremental"] = ORACLE_SQL[
    "events_holt_winters"
]

# OLS moment sums are exact and commute; the twin feeds the shared
# closed-form finalizer — the oracle IS events_linear_trend's SQL.
ORACLE_SQL["events_linear_trend_incremental"] = ORACLE_SQL[
    "events_linear_trend"
]

# Retrieval-store merges are commutative SUMs (tf, dl) feeding the
# batch operators' own assembly/scoring code — the oracles ARE the
# batch queries' SQL.
ORACLE_SQL["doc_inverted_index_incremental"] = ORACLE_SQL["doc_inverted_index"]
ORACLE_SQL["doc_bm25_incremental"] = ORACLE_SQL["doc_bm25_topk"]
ORACLE_SQL["doc_hybrid_rrf_incremental"] = ORACLE_SQL["doc_hybrid_rrf"]

# --- frequent-pattern mining / data quality (r8 third batch) --------------
from cloudfront_kinesis_log_lambda_spark.operators.mining import (  # noqa: E402
    MAX_BASKET_SIZE,
    MIN_SUPPORT,
)
from cloudfront_kinesis_log_lambda_spark.operators.quality import (  # noqa: E402
    PSI_BINS,
    PSI_DRIFT_THRESHOLD,
    PSI_SPLIT,
)

ORACLE_SQL["order_basket_rules"] = f"""
    WITH raw_items AS (
      SELECT DISTINCT l_orderkey AS basket, p_brand AS item
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    sizes AS (
      SELECT basket FROM raw_items GROUP BY 1
      HAVING COUNT(*) <= {MAX_BASKET_SIZE}),
    items AS (
      SELECT i.basket, i.item
      FROM raw_items i JOIN sizes s ON i.basket = s.basket),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
           FROM items),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS item_n
           FROM items GROUP BY 1),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2)
    SELECT p.item_a, p.item_b, p.pair_n,
           ROUND(CAST(p.pair_n AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE),
                 6) AS support,
           ROUND(CAST(p.pair_n AS DOUBLE) / CAST(na.item_n AS DOUBLE),
                 6) AS conf_a_to_b,
           ROUND(CAST(p.pair_n AS DOUBLE) / CAST(ib.item_n AS DOUBLE),
                 6) AS conf_b_to_a,
           ROUND(CAST(p.pair_n AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
                 / (CAST(na.item_n AS DOUBLE) * CAST(ib.item_n AS DOUBLE)),
                 6) AS lift
    FROM pairs p
    CROSS JOIN nb
    JOIN ic na ON na.item = p.item_a
    JOIN ic ib ON ib.item = p.item_b
    WHERE CAST(p.pair_n AS DOUBLE)
          >= CAST({MIN_SUPPORT} AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
"""

_PSI_SPLIT = PSI_SPLIT.strftime("%Y-%m-%d %H:%M:%S")
_PSI_LAST = PSI_BINS - 1
_PSI_PAD = float(PSI_BINS) * 0.5

# bin expression mirrors operators/quality.py::psi_bin_expr shape for
# shape; DuckDB FLOOR(double) returns DOUBLE, hence the BIGINT cast.
ORACLE_SQL["events_psi_drift"] = f"""
    WITH stats AS (
      SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
      FROM events
      WHERE ts < TIMESTAMP '{_PSI_SPLIT}' AND isfinite(value)
      GROUP BY 1),
    binned AS (
      SELECT e.event_type,
             CASE WHEN s.vmax = s.vmin THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST({_PSI_LAST} AS BIGINT),
                             GREATEST(CAST(0 AS BIGINT),
                       CAST(FLOOR((e.value - s.vmin) / (s.vmax - s.vmin)
                                  * CAST({PSI_BINS}.0 AS DOUBLE))
                            AS BIGINT))) END AS bin,
             (e.ts < TIMESTAMP '{_PSI_SPLIT}') AS is_ref
      FROM events e JOIN stats s USING (event_type)
      WHERE isfinite(e.value)),
    counts AS (
      SELECT event_type, bin,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cur
      FROM binned GROUP BY 1, 2),
    grid AS (
      SELECT s.event_type, CAST(g.g AS BIGINT) AS bin
      FROM stats s CROSS JOIN generate_series(0, {_PSI_LAST}) g(g)),
    filled AS (
      SELECT gr.event_type, gr.bin,
             COALESCE(c.n_ref, 0) AS n_ref,
             COALESCE(c.n_cur, 0) AS n_cur
      FROM grid gr LEFT JOIN counts c
        ON gr.event_type = c.event_type AND gr.bin = c.bin),
    totals AS (
      SELECT event_type,
             CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             CAST(SUM(n_cur) AS BIGINT) AS t_cur
      FROM filled GROUP BY 1),
    contrib AS (
      SELECT f.event_type, f.bin, t.t_ref, t.t_cur,
             ((CAST(f.n_cur AS DOUBLE) + CAST(0.5 AS DOUBLE))
                / (CAST(t.t_cur AS DOUBLE) + CAST({_PSI_PAD} AS DOUBLE))
              - (CAST(f.n_ref AS DOUBLE) + CAST(0.5 AS DOUBLE))
                / (CAST(t.t_ref AS DOUBLE) + CAST({_PSI_PAD} AS DOUBLE)))
             * LN(((CAST(f.n_cur AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(t.t_cur AS DOUBLE) + CAST({_PSI_PAD} AS DOUBLE)))
                  / ((CAST(f.n_ref AS DOUBLE) + CAST(0.5 AS DOUBLE))
                     / (CAST(t.t_ref AS DOUBLE)
                        + CAST({_PSI_PAD} AS DOUBLE)))) AS c
      FROM filled f JOIN totals t USING (event_type))
    SELECT s.event_type,
           MAX(s.t_ref) AS n_ref,
           MAX(s.t_cur) AS n_cur,
           ROUND(SUM(s.c), 6) AS psi,
           ROUND(SUM(s.c), 6) > CAST({PSI_DRIFT_THRESHOLD} AS DOUBLE)
             AS drifted,
           (MAX(struct_pack(a := ABS(s.c), b := s.bin))).b AS worst_bin
    FROM contrib s GROUP BY s.event_type
"""

ORACLE_SQL["orders_quality_checks"] = """
    WITH wide AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             ROUND(CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1
                                 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS custkey_complete,
             ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS orderkey_unique,
             ROUND(CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS status_in_set,
             ROUND(CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                        AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS totalprice_positive,
             ROUND(CAST(SUM(CASE WHEN SUBSTRING(o_orderpriority, 1, 1)
                                      IN ('1','2','3','4','5')
                                  AND SUBSTRING(o_orderpriority, 2, 1)
                                      = '-'
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS priority_format,
             ROUND(CAST(SUM(CASE WHEN o_orderdate
                                      >= TIMESTAMP '1995-01-01'
                                  AND o_orderdate
                                      < TIMESTAMP '2002-01-01'
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS orderdate_in_range
      FROM orders),
    resolved AS (
      SELECT ROUND(
               CAST((SELECT COUNT(*) FROM orders o
                     WHERE EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                    AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE),
               6) AS metric),
    longf AS (
      SELECT 'custkey_complete' AS "check", custkey_complete AS metric
        FROM wide
      UNION ALL SELECT 'orderkey_unique', orderkey_unique FROM wide
      UNION ALL SELECT 'status_in_set', status_in_set FROM wide
      UNION ALL SELECT 'totalprice_positive', totalprice_positive FROM wide
      UNION ALL SELECT 'priority_format', priority_format FROM wide
      UNION ALL SELECT 'orderdate_in_range', orderdate_in_range FROM wide
      UNION ALL SELECT 'custkey_resolves', metric FROM resolved)
    SELECT "check", metric,
           COALESCE(metric >= CAST(1.0 AS DOUBLE), FALSE) AS passed
    FROM longf
"""

# PSI bin counts are SUMs against a FROZEN reference geometry, so the
# accumulated store equals the batch counts bit-for-bit and the read
# goes through the batch finalizer — the oracle IS events_psi_drift's
# SQL.
ORACLE_SQL["events_psi_drift_incremental"] = ORACLE_SQL["events_psi_drift"]

# --- statistical tests (r8 third batch) -----------------------------------

ORACLE_SQL["events_chi2_type_hour"] = """
    WITH counts AS (
      SELECT event_type AS rv,
             CAST(EXTRACT(hour FROM ts) AS INT) AS cv,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    rt AS (SELECT rv, CAST(SUM(o) AS BIGINT) AS rn FROM counts GROUP BY 1),
    ct AS (SELECT cv, CAST(SUM(o) AS BIGINT) AS cn FROM counts GROUP BY 1),
    g AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM counts),
    grid AS (
      SELECT rt.rv, ct.cv,
             CAST(COALESCE(c.o, 0) AS BIGINT) AS o,
             CAST(rt.rn AS DOUBLE) * CAST(ct.cn AS DOUBLE)
               / CAST(g.n AS DOUBLE) AS e,
             g.n
      FROM rt CROSS JOIN ct CROSS JOIN g
      LEFT JOIN counts c ON c.rv = rt.rv AND c.cv = ct.cv),
    agg AS (
      SELECT MAX(n) AS n,
             CAST(COUNT(DISTINCT rv) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT cv) AS BIGINT) AS n_cols,
             SUM((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e)
               AS chi2_raw
      FROM grid)
    SELECT n, n_rows, n_cols,
           ROUND(chi2_raw, 6) AS chi2,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           ROUND(SQRT(chi2_raw
                      / NULLIF(CAST(n AS DOUBLE)
                               * CAST(LEAST(n_rows - 1, n_cols - 1)
                                      AS DOUBLE), 0)),
                 6) AS cramers_v
    FROM agg
"""

# Pearson r: built-in co-moment aggregation on both engines (the
# events_zscore STDDEV precedent) — ROUND absorbs accumulation-order
# noise, which stays ~1e-13 relative for a ratio of co-moments.
ORACLE_SQL["lineitem_corr_matrix"] = """
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(COVAR_SAMP(l_quantity, l_extendedprice)
                   / NULLIF(STDDEV_SAMP(l_quantity)
                            * STDDEV_SAMP(l_extendedprice), 0), 6) AS r_qp,
             ROUND(COVAR_SAMP(l_quantity, l_discount)
                   / NULLIF(STDDEV_SAMP(l_quantity)
                            * STDDEV_SAMP(l_discount), 0), 6)      AS r_qd,
             ROUND(COVAR_SAMP(l_quantity, l_tax)
                   / NULLIF(STDDEV_SAMP(l_quantity)
                            * STDDEV_SAMP(l_tax), 0), 6)           AS r_qt,
             ROUND(COVAR_SAMP(l_extendedprice, l_discount)
                   / NULLIF(STDDEV_SAMP(l_extendedprice)
                            * STDDEV_SAMP(l_discount), 0), 6)      AS r_pd,
             ROUND(COVAR_SAMP(l_extendedprice, l_tax)
                   / NULLIF(STDDEV_SAMP(l_extendedprice)
                            * STDDEV_SAMP(l_tax), 0), 6)           AS r_pt,
             ROUND(COVAR_SAMP(l_discount, l_tax)
                   / NULLIF(STDDEV_SAMP(l_discount)
                            * STDDEV_SAMP(l_tax), 0), 6)           AS r_dt
      FROM lineitem
      -- variance domain (r14), mirrors the engine's complete-row rule
      WHERE isfinite(l_quantity) AND abs(l_quantity) < 1.3407807929942596e154 AND isfinite(l_extendedprice) AND abs(l_extendedprice) < 1.3407807929942596e154 AND isfinite(l_discount) AND abs(l_discount) < 1.3407807929942596e154 AND isfinite(l_tax) AND abs(l_tax) < 1.3407807929942596e154)
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           r_qp AS pearson_r, n FROM base
    UNION ALL SELECT 'l_quantity', 'l_discount', r_qd, n FROM base
    UNION ALL SELECT 'l_quantity', 'l_tax', r_qt, n FROM base
    UNION ALL SELECT 'l_extendedprice', 'l_discount', r_pd, n FROM base
    UNION ALL SELECT 'l_extendedprice', 'l_tax', r_pt, n FROM base
    UNION ALL SELECT 'l_discount', 'l_tax', r_dt, n FROM base
"""

ORACLE_SQL["events_ab_conversion"] = """
    WITH units AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1, 2),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM units GROUP BY 1),
    j AS (
      SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
      FROM (SELECT n, conv FROM arms WHERE arm = 'A') a
      CROSS JOIN (SELECT n, conv FROM arms WHERE arm = 'B') b),
    m AS (
      SELECT *,
             SQRT((CAST(conv_a + conv_b AS DOUBLE)
                   / CAST(n_a + n_b AS DOUBLE))
                  * (CAST(1.0 AS DOUBLE)
                     - CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                  * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                     + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))) AS se
      FROM j)
    SELECT n_a, conv_a,
           ROUND(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
           n_b, conv_b,
           ROUND(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
           ROUND(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                 - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS lift,
           ROUND((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                 / NULLIF(se, 0), 6) AS z,
           ABS((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
               / NULLIF(se, 0)) > CAST(1.959964 AS DOUBLE) AS significant
    FROM m
"""

# First digit extracted arithmetically (never via float-to-text);
# DuckDB FLOOR returns DOUBLE, hence the BIGINT casts.
ORACLE_SQL["orders_benford_digits"] = """
    WITH raw AS (
      SELECT CAST(FLOOR(o_totalprice
                        / POW(CAST(10.0 AS DOUBLE),
                              CAST(FLOOR(LOG10(o_totalprice)) AS DOUBLE)))
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0 AND isfinite(o_totalprice)),
    digits AS (
      SELECT CASE WHEN d < 1 THEN CAST(9 AS BIGINT)
                  WHEN d > 9 THEN CAST(1 AS BIGINT)
                  ELSE d END AS digit
      FROM raw),
    counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY 1),
    grid AS (SELECT CAST(g.g AS BIGINT) AS digit
             FROM generate_series(1, 9) g(g)),
    filled AS (
      SELECT gr.digit, CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs
      FROM grid gr LEFT JOIN counts c ON gr.digit = c.digit),
    total AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM filled),
    base AS (
      SELECT f.digit, f.n_obs, t.n_total,
             CAST(f.n_obs AS DOUBLE)
               / NULLIF(CAST(t.n_total AS DOUBLE), 0) AS p_obs_raw,
             LOG10(CAST(1.0 AS DOUBLE)
                   + CAST(1.0 AS DOUBLE) / CAST(f.digit AS DOUBLE))
               AS p_exp_raw
      FROM filled f CROSS JOIN total t),
    contrib AS (
      SELECT *,
             ((CAST(n_obs AS DOUBLE) - p_exp_raw * CAST(n_total AS DOUBLE))
              * (CAST(n_obs AS DOUBLE) - p_exp_raw * CAST(n_total AS DOUBLE)))
             / NULLIF(p_exp_raw * CAST(n_total AS DOUBLE), 0) AS chi2_term,
             ABS(p_obs_raw - p_exp_raw) AS abs_dev
      FROM base),
    stats AS (
      SELECT SUM(chi2_term) AS chi2_raw, SUM(abs_dev) / CAST(9.0 AS DOUBLE)
               AS mad_raw
      FROM contrib)
    SELECT c.digit, c.n_obs,
           ROUND(c.p_obs_raw, 6) AS p_obs,
           ROUND(c.p_exp_raw, 6) AS p_benford,
           ROUND(c.chi2_term, 6) AS chi2_term,
           ROUND(s.chi2_raw, 6) AS chi2,
           ROUND(s.mad_raw, 6) AS mad
    FROM contrib c CROSS JOIN stats s
"""

# Contingency / digit counts are integer SUMs feeding the batch
# operators' own finalizers — the oracles ARE the batch entries' SQL.
ORACLE_SQL["events_chi2_incremental"] = ORACLE_SQL["events_chi2_type_hour"]
ORACLE_SQL["orders_benford_incremental"] = ORACLE_SQL[
    "orders_benford_digits"
]

# The edge store is a DISTINCT fact set (idempotent even under new-id
# re-delivery) served through the batch pair expansion; the quality
# twin merges SUM counters + a per-key count store through the batch
# predicates/verdicts — the oracles ARE the batch entries' SQL.
ORACLE_SQL["order_basket_rules_incremental"] = ORACLE_SQL[
    "order_basket_rules"
]
ORACLE_SQL["orders_quality_incremental"] = ORACLE_SQL[
    "orders_quality_checks"
]

# KS grid: events values are 2-decimal by construction, so the
# quantize-3 ROUND is an identity on this data (the knob exists for
# continuous columns at scale); cumulative counts are exact integers
# and D is a MAX (order-free), so only the final divisions are float.
ORACLE_SQL["events_ks_drift"] = f"""
    WITH grid AS (
      SELECT event_type, ROUND(value, 3) AS v,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
             -- null-strict current-cohort test (r15): the engine's
             -- when/otherwise drops NULL ts from BOTH cohorts, so the
             -- old ELSE 1 spelling counted a NULL-ts row as current
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
      FROM events GROUP BY 1, 2),
    totals AS (
      SELECT event_type,
             CAST(SUM(c_ref) AS BIGINT) AS n_ref,
             CAST(SUM(c_cur) AS BIGINT) AS n_cur
      FROM grid GROUP BY 1
      HAVING SUM(c_ref) > 0 AND SUM(c_cur) > 0),
    cum AS (
      SELECT event_type,
             CAST(SUM(c_ref) OVER (PARTITION BY event_type ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_ref,
             CAST(SUM(c_cur) OVER (PARTITION BY event_type ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cur
      FROM grid),
    d AS (
      SELECT c.event_type, t.n_ref, t.n_cur,
             ABS(CAST(c.cum_ref AS DOUBLE) / CAST(t.n_ref AS DOUBLE)
                 - CAST(c.cum_cur AS DOUBLE) / CAST(t.n_cur AS DOUBLE))
               AS dd
      FROM cum c JOIN totals t USING (event_type)),
    agg AS (
      SELECT event_type, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
             MAX(dd) AS d_raw
      FROM d GROUP BY 1)
    SELECT event_type, n_ref, n_cur,
           ROUND(d_raw, 6) AS ks_d,
           ROUND(CAST(1.358 AS DOUBLE)
                 * SQRT(CAST(n_ref + n_cur AS DOUBLE)
                        / (CAST(n_ref AS DOUBLE)
                           * CAST(n_cur AS DOUBLE))), 6) AS ks_crit,
           d_raw > CAST(1.358 AS DOUBLE)
                   * SQRT(CAST(n_ref + n_cur AS DOUBLE)
                          / (CAST(n_ref AS DOUBLE)
                             * CAST(n_cur AS DOUBLE))) AS drifted
    FROM agg
"""

# The KS grid is SUM-mergeable counts feeding the batch finalizer —
# the oracle IS events_ks_drift's SQL.
ORACLE_SQL["events_ks_incremental"] = ORACLE_SQL["events_ks_drift"]

# Skew profile: counts are exact; percentiles use the proven
# percentile↔quantile_cont parity; entropy's n·ln n sum is a ~1e-14
# noise float fold absorbed by ROUND 6.
ORACLE_SQL["events_user_skew_profile"] = """
    WITH counts AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    prof AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(n) AS BIGINT) AS max_n,
             ROUND(quantile_cont(n, 0.5), 6) AS p50_n,
             ROUND(quantile_cont(n, 0.99), 6) AS p99_n,
             SUM(CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE))) AS s_nlogn,
             CAST(MAX(CASE WHEN k IS NULL THEN n ELSE 0 END) AS BIGINT)
               AS null_rows
      FROM counts)
    SELECT n_rows, n_keys, max_n, p50_n, p99_n, null_rows,
           ROUND(CAST(max_n AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
             AS top_share,
           ROUND(CAST(max_n AS DOUBLE) / NULLIF(p50_n, 0), 6)
             AS skew_ratio,
           ROUND(LN(CAST(n_rows AS DOUBLE))
                 - s_nlogn / CAST(n_rows AS DOUBLE), 6) AS entropy,
           ROUND((LN(CAST(n_rows AS DOUBLE))
                  - s_nlogn / CAST(n_rows AS DOUBLE))
                 / NULLIF(LN(CAST(n_keys AS DOUBLE)), 0), 6) AS balance
    FROM prof
"""

# Embedding drift: per-dim float32 elements quantize at DECIMAL(18,9)
# (exact sums in scaled units); only mean/cosine math is float,
# rounded at the edge.
ORACLE_SQL["embedding_drift"] = """
    -- DATASET CONTRACT of this oracle (review finding): 64 is THIS
    -- dataset's embedding dim, and the IS NOT NULL guard mirrors
    -- posexplode's skip-null-array behavior so a label whose every
    -- vector is NULL drops identically on both sides. The Spark
    -- operator itself is dim-generic.
    WITH e AS (
      SELECT label, (vec_id % 2 = 0) AS is_ref, g.g AS dim,
             CAST(embedding[g.g] AS DECIMAL(18,9)) AS vd
      FROM embeddings CROSS JOIN generate_series(1, 64) g(g)
      WHERE embedding IS NOT NULL
        -- decimal-exact domain (r14), per element like the posexplode
        AND isfinite(CAST(embedding[g.g] AS DOUBLE))
        AND abs(CAST(embedding[g.g] AS DOUBLE)) < 999999999.0),
    counts AS (
      SELECT label,
             CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_cur
      FROM embeddings GROUP BY 1
      HAVING SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) > 0
         AND SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) > 0),
    per_dim AS (
      SELECT label, dim,
             CAST(SUM(CASE WHEN is_ref THEN vd END) AS DECIMAL(28,9))
               AS s_ref,
             CAST(SUM(CASE WHEN NOT is_ref THEN vd END) AS DECIMAL(28,9))
               AS s_cur
      FROM e GROUP BY 1, 2),
    means AS (
      SELECT p.label, c.n_ref, c.n_cur,
             CAST(p.s_ref AS DOUBLE) / CAST(c.n_ref AS DOUBLE) AS m_ref,
             CAST(p.s_cur AS DOUBLE) / CAST(c.n_cur AS DOUBLE) AS m_cur
      FROM per_dim p JOIN counts c USING (label)),
    agg AS (
      SELECT label, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
             SUM(m_ref * m_cur) AS dot,
             SUM(m_ref * m_ref) AS nr2,
             SUM(m_cur * m_cur) AS nc2,
             SUM((m_ref - m_cur) * (m_ref - m_cur)) AS l2sq
      FROM means GROUP BY 1)
    SELECT label, n_ref, n_cur,
           ROUND(dot / NULLIF(SQRT(nr2) * SQRT(nc2), 0), 6)
             AS centroid_cosine,
           ROUND(SQRT(l2sq), 6) AS centroid_l2
    FROM agg
"""

# Entity resolution: the fuzzy-pair CTEs verbatim from
# part_fuzzy_pairs, closed transitively (the near_dup_clusters
# recursive-reach pattern), then survivorship per component. The
# struct max mirrors Spark's lexicographic (length, name) tie-break.
ORACLE_SQL["part_entity_resolution"] = f"""
    WITH RECURSIVE names AS (SELECT DISTINCT p_name AS name FROM part),
    c1 AS (SELECT substr(name, 1, {FUZZY_PREFIX}) AS b1, COUNT(*) AS n1
           FROM names GROUP BY 1),
    keyed AS (
      SELECT name,
             CASE WHEN n1 > {FUZZY_MAX_BLOCK}
                  THEN 'D:' || substr(name, 1, {FUZZY_DEEP_PREFIX})
                  ELSE 'S:' || substr(name, 1, {FUZZY_PREFIX}) END AS blk
      FROM names JOIN c1 ON substr(name, 1, {FUZZY_PREFIX}) = b1),
    c2 AS (SELECT blk, COUNT(*) AS n2 FROM keyed GROUP BY 1),
    ok AS (SELECT name, blk FROM keyed JOIN c2 USING (blk)
           WHERE n2 <= {FUZZY_MAX_BLOCK}),
    fp AS (
      SELECT a.name AS name_a, b.name AS name_b
      FROM ok a JOIN ok b
        ON a.blk = b.blk
       AND a.name < b.name
       AND abs(length(a.name) - length(b.name)) <= {FUZZY_MAX_DIST}
      WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}),
    edges AS (
      SELECT name_a AS u, name_b AS v FROM fp
      UNION SELECT name_b, name_a FROM fp),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    canon AS (
      SELECT u AS name, LEAST(u, MIN(v)) AS entity_id
      FROM reach GROUP BY u),
    members AS (
      SELECT p.p_partkey, p.p_name, p.p_retailprice, c.entity_id
      FROM part p JOIN canon c ON p.p_name = c.name)
    SELECT entity_id,
           CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           (MAX(struct_pack(l := length(p_name), nm := p_name))).nm
             AS canonical_name,
           CAST(MIN(p_partkey) AS BIGINT) AS min_partkey,
           ROUND(MAX(p_retailprice), 2) AS max_price
    FROM members GROUP BY 1
"""

# Per-dim decimal sums and cohort counts merge exactly, feeding the
# batch finalizer — the oracle IS embedding_drift's SQL.
ORACLE_SQL["embedding_drift_incremental"] = ORACLE_SQL["embedding_drift"]


# --- CloudFront pipeline oracles (VERDICT r12 item 8) -----------------------
# The flagship reference pipeline is deterministic end-to-end (only the
# wire twin's uuid PartitionKey is random), and its input is the shared
# fixture tree at testing.fixtures.FIXTURE_DIR — the SAME constant the
# registry queries read, so the two sides cannot drift onto different
# paths. __spark_entry__.oracle_sql() materializes the tree before
# returning these strings, so DuckDB always finds the files regardless
# of which side the driver runs first.
#
# Wire-parity notes for the DuckDB leg:
# - quote=''/escape='': the engine parses with split('\t') — no quote
#   handling — so the oracle must read raw fields too;
# - LATENT DIVERGENCE, pinned here (ADVICE r13): read_csv reads an
#   empty unquoted field as NULL while the engine's split('\t')
#   contract (sources/cloudfront.py) deliberately yields '' for
#   adjacent tabs. Parity holds because the fixture generator
#   (testing/fixtures.py) never emits an empty field — if a future
#   fixture change adds one, the oracle needs force_not_null over all
#   columns (or COALESCE(col, '')) to keep matching the wire contract;
# - the header '#' lines arrive as 1-field rows under null_padding and
#   are dropped by the NOT LIKE '#%' filter (DuckDB 1.0 read_csv has no
#   comment option);
# - DuckDB 1.0 has no url_decode; the replace chain decodes exactly the
#   escape set the deterministic fixture generator emits
#   (testing/fixtures.py _UAS/_PATHS: %2F %20 %3B %3A %2B) — each
#   decodes to a non-'%' character, so the chain is order-independent
#   and equals urllib.parse.unquote on this closed universe ('+'
#   correctly survives undecoded, matching unquote, not url_decode).
from cloudfront_kinesis_log_lambda_spark.schema import FIELDNAMES as _CF_FIELDS  # noqa: E402
from cloudfront_kinesis_log_lambda_spark.testing.fixtures import (  # noqa: E402
    FIXTURE_DIR as _CF_FIXTURE_DIR,
)

_CF_RAW_CTE = f"""
    WITH raw AS (
      SELECT * FROM read_csv('{_CF_FIXTURE_DIR}/cloudfront/*/*/*.gz',
          delim='\t', header=false, all_varchar=true, null_padding=true,
          auto_detect=false, quote='', escape='',
          filename=true,
          columns={{{", ".join(f"'{n}': 'VARCHAR'" for n in _CF_FIELDS)}}})
      WHERE log_date NOT LIKE '#%'
    ),
    enriched AS (
      SELECT
        {", ".join(f'"{n}"' for n in _CF_FIELDS if n not in ("log_date", "log_time", "http_referer", "http_user_agent"))},
        replace(replace(replace(replace(replace("http_user_agent",
            '%2F','/'), '%20',' '), '%3B',';'), '%3A',':'), '%2B','+')
          AS "http_user_agent",
        strftime(strptime(log_date || ' ' || log_time, '%Y-%m-%d %H:%M:%S'),
            '%Y-%m-%dT%H:%M:%S') || '+00:00' AS "@timestamp",
        regexp_extract(filename, '/cloudfront/([^/]+)/([^/]+)/[^/]+$', 2)
          AS "serviceId",
        'globaledge_cloudfront' AS "type",
        regexp_extract(filename, '/cloudfront/([^/]+)/([^/]+)/[^/]+$', 1)
          AS "env"
      FROM raw
    )
"""

ORACLE_SQL["cloudfront_enriched"] = _CF_RAW_CTE + """
    SELECT * FROM enriched
"""

ORACLE_SQL["cloudfront_status_rollup"] = _CF_RAW_CTE + """
    SELECT env,
           substr(http_status, 1, 1) AS status_class,
           COUNT(*) AS n_requests,
           CAST(SUM(CAST(bytes_sent AS BIGINT)) AS BIGINT) AS bytes_sent,
           COUNT(DISTINCT src_ip) AS n_client_ips
    FROM enriched
    GROUP BY env, status_class
"""
