-- USING SAMPLE (row-count form)
SELECT * FROM src_orders USING SAMPLE 50
