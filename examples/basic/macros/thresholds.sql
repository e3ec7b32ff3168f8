{% macro big_order_floor() %}200000{% endmacro %}
