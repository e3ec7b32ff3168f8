-- Incremental event log: the bootstrap loads all seed rows; later runs
-- merge only events newer than the high-water mark ({{ this }}).
SELECT event_id, customer_id, qty, updated_at
FROM raw_events
WHERE qty >= {{ var('min_qty', '1') }}
{% if is_incremental() %}
  AND event_id > (SELECT max(event_id) FROM {{ this }})
{% endif %}
