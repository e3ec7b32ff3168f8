-- DuckDB PIVOT statement form, dynamic ON (values enumerated by the shim);
-- runs via `graft run-file` against the pipeline's persisted views
PIVOT src_orders ON o_orderstatus USING sum(o_totalprice) AS total
GROUP BY o_orderpriority;

-- FROM-first shorthand: a bare FROM is a complete query in DuckDB (note a
-- FROM-first MODEL is rejected by the record-producing prefix rule in both
-- engines -- the shorthand lives in scripts and side statements)
FROM src_orders WHERE o_totalprice > 150000;

SELECT count() FROM src_orders
