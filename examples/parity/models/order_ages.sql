-- round-7 shim surface: jinja {% set %} assignments (literal, filtered)
-- drive the anchor and threshold, and DuckDB's 3-arg date_diff (boundary
-- crossings, not complete units) maps to the registered native
-- date_diff_boundary expression.
{% set anchor = '1997-03-15 13:30:00' %}
{% set min_total = 150000 %}
{% set label = 'aged' | upper %}

SELECT o_orderkey,
       '{{ label }}' AS tag,
       date_diff('month', TIMESTAMP '{{ anchor }}', o_orderdate) AS months_out,
       date_diff('day',   TIMESTAMP '{{ anchor }}', o_orderdate) AS days_out
FROM src_orders
WHERE o_totalprice > {{ min_total }}
