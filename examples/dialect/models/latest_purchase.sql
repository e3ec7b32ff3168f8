-- DuckDB DISTINCT ON exactly as a DuckDB user writes it: each user's most
-- recent purchase. The shim rewrites it to the row_number idiom (and
-- resolves the ORDER BY into the window, ordinals and aliases included).
SELECT DISTINCT ON (user_id) user_id, ts, amount
FROM purchases
ORDER BY user_id, ts DESC
