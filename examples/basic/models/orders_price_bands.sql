-- Depends on source_orders. Exercises the wider jinja subset through the
-- real pipeline path: {% set %} inline + {% endset %} block form, a
-- range() loop building a CASE ladder, loop.first/loop.last, and a
-- filtered slot — all rendered before the dialect shim ever sees the SQL.
{% set band_width = '100000' %}
{% set band_expr %}CASE
  {%- for i in range(4) %}
  WHEN o_totalprice < {{ band_width }} * {{ loop.index }} THEN 'band_{{ i }}'
  {%- endfor %}
  ELSE 'band_top' END{% endset %}
SELECT {{ band_expr }} AS price_band,
       count() AS n_orders
FROM source_orders
GROUP BY 1
