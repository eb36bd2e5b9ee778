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
    "order_price_delta": """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice - LAG(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
                 AS price_delta
        FROM orders
    """,
    "running_customer_spend": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_spend
        FROM orders
    """,
    # --- sort / limit / set ops -----------------------------------------
    "top_orders": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
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
    "events_json_props": """
        SELECT event_type,
               COUNT(*)                                                AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)       AS avg_k
        FROM events
        GROUP BY event_type
    """,
    "sessionize_events": """
        WITH gaps AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                         - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
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
}
