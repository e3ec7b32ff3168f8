-- Every document exploded into 8-token chunks via the native token_chunks
-- kernel (the same codegen expression DedupOps.chunkDedup uses), with an
-- md5 fingerprint per chunk.
SELECT doc_id, t.pos, t.chunk, md5(t.chunk) AS fp
FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
LATERAL VIEW posexplode(token_chunks(split(lower(text), '\\s+'), 8))
  t AS pos, chunk
