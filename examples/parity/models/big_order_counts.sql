-- round-6 shim surface: a DuckDB table macro (CREATE MACRO … AS TABLE)
-- defined as a side statement of the same model, then called in FROM
-- position — the shim registers the definition and inlines the call as a
-- parenthesized subquery. The src_orders edge comes from the macro BODY.
CREATE MACRO big_orders(lim) AS TABLE
  SELECT * FROM src_orders WHERE o_totalprice > lim;

SELECT o_orderstatus, count() AS n
FROM big_orders(200000)
GROUP BY o_orderstatus
