-- Duplicate-chunk inventory: which passages occur more than once
-- corpus-wide, and where they first appear.
SELECT fp, count() AS n_copies, min(doc_id) AS first_doc
FROM corpus_chunks
GROUP BY fp
HAVING count() > 1
