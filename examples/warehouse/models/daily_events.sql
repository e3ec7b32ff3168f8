-- Microbatch (dbt 1.9): the event log re-materialized as day-partitioned
-- swaps — each event-time day is processed independently and overwrites
-- only its own partition, so a wide backfill (--event-time-start/end)
-- or a late-arriving day never rewrites history outside its window.
SELECT updated_at AS ts,
       CAST(updated_at AS DATE) AS d,
       event_id, customer_id, qty
FROM order_events
