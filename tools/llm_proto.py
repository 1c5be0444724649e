#!/usr/bin/env python3
"""Dev-only prototype of the LLM-pipeline oracle SQL (tools/, not shipped)."""
import duckdb, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/{SF}/{t}.parquet'")

SHINGLES = """
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM words) t
)"""

QUERIES = {
  "dedup_exact": """
    SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""",
  "dedup_minhash_pairs": f"""
    WITH {SHINGLES.strip()},
    sigs AS (
      SELECT doc_id, j, MIN(md5(CAST(j AS VARCHAR) || '|' || sh)) AS sig
      FROM shingles, (SELECT unnest(generate_series(0, 7)) AS j) g
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, j // 2 AS b,
             md5(MAX(CASE WHEN j % 2 = 0 THEN sig END) || '|' ||
                 MAX(CASE WHEN j % 2 = 1 THEN sig END)) AS band_hash
      FROM sigs GROUP BY doc_id, j // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.band_hash = b.band_hash
                               AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS est_sim
    FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
                JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
    GROUP BY c.doc_a, c.doc_b ORDER BY c.doc_a, c.doc_b""",
  "text_simhash": f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    toks AS (SELECT doc_id, unnest(w) AS tok FROM words),
    bits AS (
      SELECT doc_id, i,
             CASE WHEN SUM(CASE WHEN substr(md5(tok), i, 1) IN
                    ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM toks, (SELECT unnest(generate_series(1, 32)) AS i) g
      GROUP BY doc_id, i
    )
    SELECT doc_id, string_agg(bit, '' ORDER BY i) AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id""",
  "dedup_jaccard_pairs": f"""
    WITH {SHINGLES.strip()},
    card AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.both AS DOUBLE) / (ca.n + cb.n - i.both), 6) AS jaccard
    FROM inter i JOIN card ca ON ca.doc_id = i.doc_a
                 JOIN card cb ON cb.doc_id = i.doc_b
    WHERE CAST(i.both AS DOUBLE) / (ca.n + cb.n - i.both) >= 0.6
    ORDER BY i.doc_a, i.doc_b""",
  "embed_cosine_topk": """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT vec_id,
             list_dot_product(embedding::DOUBLE[], qv) /
               (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                sqrt(list_dot_product(qv, qv))) AS cos
      FROM embeddings, q WHERE vec_id <> 0)
    SELECT vec_id, ROUND(cos, 6) AS cos_sim FROM s
    ORDER BY ROUND(cos, 6) DESC, vec_id LIMIT 20""",
  "embed_ann_lsh": """
    WITH b AS (
      SELECT vec_id, embedding,
        (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings),
    q AS (SELECT embedding::DOUBLE[] AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT vec_id, bucket,
           ROUND(list_dot_product(embedding::DOUBLE[], qv) /
             (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
              sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM b, q WHERE bucket = qb AND vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10""",
  "embed_knn_join": """
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 20),
    sims AS (
      SELECT q.q_id, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qv, q.qv))) AS cos
      FROM embeddings e, q WHERE e.vec_id <> q.q_id),
    ranked AS (
      SELECT q_id, vec_id, ROUND(cos, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ROUND(cos, 6) DESC, vec_id) AS rk
      FROM sims)
    SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= 5
    ORDER BY q_id, rk""",
}

for name, q in QUERIES.items():
    t0 = time.time()
    try:
        df = con.sql(q).df()
        print(f"== {name}: {len(df)} rows in {time.time()-t0:.2f}s")
        print(df.head(3).to_string())
    except Exception as e:
        print(f"!! {name} FAILED: {e}")
