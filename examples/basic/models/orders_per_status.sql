-- Depends on source_orders (discovered by parsing the FROM clause).
-- count() is DuckDB shorthand; the shim rewrites it to count(*).
-- big_order_floor is a jinja-style macro from macros/thresholds.sql.
SELECT o_orderstatus,
       count() AS n_orders,
       sum(CASE WHEN o_totalprice > {{ big_order_floor() }} THEN 1 ELSE 0 END) AS n_big
FROM source_orders
GROUP BY o_orderstatus
