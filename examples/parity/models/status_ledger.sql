-- round-5 shim surface: UNION ALL BY NAME aligns two differently-shaped
-- arms (missing columns fill with NULL, left-arm column order), arg_max
-- renames to max_by, and GROUP BY ALL passes through to Spark natively
SELECT o_orderstatus AS bucket, count() AS n,
       arg_max(o_custkey, o_totalprice) AS top_entity
FROM src_orders GROUP BY ALL
UNION ALL BY NAME
SELECT source AS bucket, count() AS n, max(len(text)) AS max_len
FROM src_docs GROUP BY ALL
