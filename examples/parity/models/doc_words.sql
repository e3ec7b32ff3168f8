-- list comprehension + string_split + len(), all DuckDB-isms
SELECT doc_id,
       [upper(w) for w in string_split(text, ' ') if w != ''] AS words
FROM src_docs
WHERE len(text) > 100
