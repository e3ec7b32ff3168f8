-- DISTINCT ON: each customer's most recent order
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM src_orders
ORDER BY o_custkey, o_orderdate DESC
