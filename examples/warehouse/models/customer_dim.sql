-- SCD2 snapshot under the timestamp strategy: each customer's latest
-- state, versioned by its own updated_at.
SELECT customer_id,
       max_by(tier, updated_at) AS tier,
       max(updated_at) AS updated_at
FROM (SELECT c.customer_id, c.tier, e.updated_at
      FROM customers_seed c JOIN order_events e USING (customer_id))
GROUP BY customer_id
