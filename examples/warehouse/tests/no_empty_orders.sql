-- dbt singular test: violating rows fail the model.
SELECT * FROM {{ this }} WHERE total_qty <= 0 OR n_orders <= 0
