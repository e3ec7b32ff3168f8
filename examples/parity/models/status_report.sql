-- side statements: SUMMARIZE (profiled + discarded) and COPY … TO (csv
-- export of the same aggregate the model materializes)
SUMMARIZE src_orders;

COPY (SELECT o_orderstatus, count() AS n FROM src_orders GROUP BY o_orderstatus)
  TO '/tmp/graft-parity-export/status_counts.csv' (FORMAT csv, HEADER);

SELECT o_orderstatus, count() AS n
FROM src_orders
GROUP BY o_orderstatus
