-- Per-customer rollup over the incremental events, gated by the full
-- data-test surface (not_null, relationships to the seed, custom SQL).
SELECT customer_id,
       count() AS n_orders,
       CAST(sum(qty) AS BIGINT) AS total_qty
FROM order_events
GROUP BY customer_id
