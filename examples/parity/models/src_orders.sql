-- DuckDB-style source model (read_parquet shim)
SELECT * FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
