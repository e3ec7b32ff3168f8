-- QUALIFY + a jinja macro whose body loops over its arguments
SELECT o_custkey, o_orderkey, o_totalprice,
       {{ bucket_flags('o_totalprice', 100000, 200000) }}
FROM src_orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) <= 2
