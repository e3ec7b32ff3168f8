-- DuckDB-style source model: read_parquet + strftime + a scalar macro
-- defined as a side statement (reference passes both through to DuckDB).
-- events.parquet carries TIMESTAMP(NANOS), which Spark reads as a long —
-- the timestamp_micros(... div 1000) conversion is the one Spark-side
-- line in this pipeline (documented dialect divergence).
CREATE MACRO usd(v) AS round(v, 2);

SELECT user_id, timestamp_micros(ts div 1000) AS ts, usd(value) AS amount
FROM read_parquet('/root/testdata/sf0.001/events.parquet')
WHERE event_type = 'purchase'
