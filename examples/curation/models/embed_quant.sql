-- Int8 storage audit over the embedding corpus: the fused kernel returns
-- [scale, max_abs_err, rmse] in one traversal. Subscripts are DuckDB
-- dialect: 1-based (the shim maps them onto try_element_at).
SELECT vec_id,
       round(st[1], 8) AS scale,
       round(st[2], 8) AS max_abs_err,
       round(st[3], 8) AS rmse
FROM (SELECT vec_id, int8_quant_stats(embedding) AS st
      FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet'))
