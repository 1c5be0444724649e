#!/usr/bin/env python3
"""Dev-only prototype of the analytics/events oracle SQL (tools/, not shipped)."""
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
con = duckdb.connect()
for t in ["documents", "lineitem", "orders", "customer", "events", "embeddings",
          "region", "nation", "supplier", "part"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/{SF}/{t}.parquet'")

D2 = "DECIMAL(18,2)"
QUERIES = {
  "tpch_q1": f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS {D2})) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS {D2})) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS {D2}) * (1 - CAST(l_discount AS {D2}))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS {D2}) * (1 - CAST(l_discount AS {D2})) * (1 + CAST(l_tax AS {D2}))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS {D2})) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_discount AS {D2})) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus""",
  "tpch_q3_top10": f"""
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS {D2}) * (1 - CAST(l_discount AS {D2}))) AS DOUBLE) AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10""",
  "tpch_q5_region": f"""
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS {D2}) * (1 - CAST(l_discount AS {D2}))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name""",
  "tpch_q4_priority": """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority""",
  "window_topk_orders": """
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM customer JOIN orders ON c_custkey = o_custkey) t
    WHERE rk <= 3 ORDER BY c_custkey, rk""",
  "rollup_lineitem": f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS {D2})) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus""",
  "events_tumbling": f"""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS {D2})) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
  "events_sessions": f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
    ), flagged AS (
      SELECT *, CASE WHEN us - LAG(us) OVER w > 1800000000 OR LAG(us) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us,
           CAST(SUM(CAST(value AS {D2})) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
  "events_json_extract": """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type""",
  "events_lag_gap": """
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) -
             LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
    FROM events ORDER BY user_id, event_id""",
  "events_rollup_day": f"""
    SELECT COALESCE(strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d'), 'ALL') AS day,
           COALESCE(event_type, 'ALL') AS event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS {D2})) AS DOUBLE) AS sum_value
    FROM events GROUP BY ROLLUP(1, 2) ORDER BY day, event_type""",
}

for name, q in QUERIES.items():
    try:
        df = con.sql(q).df()
        print(f"== {name}: {len(df)} rows; cols={list(df.columns)}")
        print(df.head(3).to_string())
    except Exception as e:
        print(f"!! {name} FAILED: {e}")
