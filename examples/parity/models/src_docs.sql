SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
