{% macro bucket_flags(c, lo, hi) %}{% for b in [lo, hi] -%}
(CASE WHEN {{ c }} >= {{ b }} THEN 1 ELSE 0 END) AS ge_{{ b }}{% if not loop.last %}, {% endif %}
{%- endfor %}{% endmacro %}
