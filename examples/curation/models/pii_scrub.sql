-- PII scrub straight from SQL: redact_pii is the registered native chain
-- (email -> IP -> phone, the SAME shared patterns the TextOps operator
-- and the q91 oracle use), so the scrubbed corpus can never disagree
-- with the DataFrame path. The fixtures carry no PII, so the model
-- plants a synthetic contact line per doc (the q91 pattern) and scrubs.
SELECT doc_id,
       redact_pii(text || ' contact user' || CAST(doc_id AS STRING) ||
                  '@' || source || '.example.com or +1-555-' ||
                  lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) AS clean_text
FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
