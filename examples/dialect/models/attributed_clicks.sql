-- ASOF JOIN exactly as a DuckDB user writes it: each click matched to the
-- latest prior purchase of the same user. SUMMARIZE runs as a side
-- statement (rows computed and discarded, reference pass-through parity).
SUMMARIZE purchases;

SELECT c.event_id, c.user_id, c.ts,
       p.amount AS purch_amount,
       len(c.props) AS props_len
FROM (SELECT event_id, user_id, ts, props
      FROM read_parquet('/root/testdata/sf0.001/events.parquet')
      WHERE event_type = 'click') c
ASOF JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
