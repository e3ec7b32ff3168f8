-- Int8-quantized retrieval via the native kernels, straight from SQL:
-- quantize each unit vector once at fixed scale 127, rank candidates by
-- the integer dot (sim/127^2 ~ cosine). QUALIFY is DuckDB dialect; the
-- shim rewrites it to the row_number idiom.
SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
       int8_dot(a.qv, b.qv) AS sim
FROM (SELECT vec_id, int8_unit_quantize(vector_normalize(embedding)) AS qv
      FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
      WHERE vec_id < 3) a
JOIN (SELECT vec_id, int8_unit_quantize(vector_normalize(embedding)) AS qv
      FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')) b
  ON a.vec_id <> b.vec_id
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) <= 5
