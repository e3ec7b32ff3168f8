-- DuckDB PIVOT statement form, dynamic ON (values enumerated by the shim);
-- runs via `graft run-file` against the pipeline's persisted views
PIVOT src_orders ON o_orderstatus USING sum(o_totalprice) AS total
GROUP BY o_orderpriority;

-- FROM-first shorthand: a bare FROM is a complete query in DuckDB (note a
-- FROM-first MODEL is rejected by the record-producing prefix rule in both
-- engines -- the shorthand lives in scripts and side statements)
FROM src_orders WHERE o_totalprice > 150000;

-- bracket + struct + series idioms: 1-based subscripts, slices, list and
-- struct literals, lateral unnest, generate_series
SELECT g.k AS bucket,
       ([10, 20, 30])[1] AS first_elem,
       ({'hi': o_cnt}).hi AS order_count
FROM (SELECT count() AS o_cnt FROM src_orders) c,
     generate_series(1, 3) AS g(k);

SELECT z.w AS word, count() AS n
FROM (SELECT ['alpha', 'beta', 'alpha'] AS ws) t, unnest(t.ws) AS z(w)
GROUP BY ALL ORDER BY n DESC, word;

SELECT count() FROM src_orders
