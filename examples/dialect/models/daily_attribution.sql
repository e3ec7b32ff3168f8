-- Aggregation over the shimmed models: count(), strftime, list functions.
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count() AS n_clicks,
       round(sum(purch_amount), 2) AS attributed,
       array_length(list_value('click', 'purchase')) AS n_types
FROM attributed_clicks
GROUP BY day
