-- DuckDB PIVOT statement form, dynamic ON (values enumerated by the shim);
-- runs via `graft run-file` against the pipeline's persisted views
PIVOT src_orders ON o_orderstatus USING sum(o_totalprice) AS total
GROUP BY o_orderpriority;

SELECT count() FROM src_orders
