-- DuckDB-style source model: read_parquet + a scalar macro defined as a
-- side statement (reference passes both through to DuckDB). events.ts is
-- parquet timestamp[us] naive, which Spark reads as TIMESTAMP_NTZ — the
-- same naive TIMESTAMP DuckDB sees, so the query runs unchanged in both
-- engines (DIALECT.md "Timestamps").
CREATE MACRO usd(v) AS round(v, 2);

SELECT user_id, ts, usd(value) AS amount
FROM read_parquet('/root/testdata/sf0.001/events.parquet')
WHERE event_type = 'purchase'
