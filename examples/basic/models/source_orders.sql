-- Source model: ingest raw parquet (the dialect shim rewrites
-- read_parquet(...) to Spark's file-format table syntax). Materialized as
-- a table per config.yaml.
SELECT *
FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
