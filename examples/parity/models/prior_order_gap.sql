-- ASOF LEFT JOIN: each order matched to the same customer's latest PRIOR
-- order (first orders keep a NULL prev_date via LEFT)
SELECT cur.o_orderkey, cur.o_custkey, cur.o_orderdate,
       prev.o_orderdate AS prev_date
FROM src_orders cur
ASOF LEFT JOIN src_orders prev
  ON cur.o_custkey = prev.o_custkey AND cur.o_orderdate > prev.o_orderdate
