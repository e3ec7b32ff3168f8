-- COLUMNS('re') expands per matched source column; the wrapped call
-- applies per column and keeps the source column names (DuckDB behavior)
SELECT o_orderstatus, max(COLUMNS('custkey|totalprice'))
FROM src_orders
GROUP BY o_orderstatus
