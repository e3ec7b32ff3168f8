package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class MacroRendererSpec extends AnyFunSuite {

  test("renders a simple macro call with positional args") {
    val macros = "{% macro mul(a, b) %}({{ a }} * {{ b }}){% endmacro %}"
    val out = MacroRenderer.render("SELECT {{ mul(price, 2) }} FROM t", macros)
    assert(out == "SELECT (price * 2) FROM t")
  }

  test("keyword args and defaults") {
    val macros =
      "{% macro disc(col, pct=0.1) %}{{ col }} * (1 - {{ pct }}){% endmacro %}"
    assert(MacroRenderer.render("SELECT {{ disc(x) }}", macros) ==
      "SELECT x * (1 - 0.1)")
    assert(MacroRenderer.render("SELECT {{ disc(x, pct=0.5) }}", macros) ==
      "SELECT x * (1 - 0.5)")
  }

  test("macros can call macros (fixpoint expansion)") {
    val macros =
      """{% macro inner(x) %}abs({{ x }}){% endmacro %}
        |{% macro outer(y) %}{{ inner(y) }} + 1{% endmacro %}""".stripMargin
    assert(MacroRenderer.render("SELECT {{ outer(v) }}", macros) ==
      "SELECT abs(v) + 1")
  }

  test("macro defined inline in the model source") {
    val src =
      """{% macro two() %}2{% endmacro %}
        |SELECT {{ two() }}""".stripMargin
    assert(MacroRenderer.render(src, "") == "SELECT 2")
  }

  test("undefined names render empty (jinja empty-context behavior)") {
    assert(MacroRenderer.render("SELECT {{ nope(1) }}{{ also_nope }} 1", "") ==
      "SELECT  1")
  }

  test("string-literal args keep commas intact") {
    val macros = "{% macro q(s) %}'{{ s }}'{% endmacro %}"
    assert(MacroRenderer.render("SELECT {{ q('a,b') }}", macros) ==
      "SELECT 'a,b'")
  }

  test("nested-call args substitute simultaneously (no capture)") {
    // an argument whose text equals a LATER parameter name must not be
    // re-substituted: ratio(den, 2) is den / 2, never 2 / 2
    val macros =
      """{% macro per(x, y) %}{{ x }} / {{ y }}{% endmacro %}
        |{% macro ratio(num, den) %}{{ per(num, den) }}{% endmacro %}""".stripMargin
    assert(MacroRenderer.render("SELECT {{ ratio(den, 2) }} FROM t", macros) ==
      "SELECT den / 2 FROM t")
  }

  test("{% for %} over a literal list inside a macro body, with loop.last") {
    // the canonical use: a macro generating a comma-separated column list
    val macros =
      """{% macro sums(suffix) %}{% for c in ['a', 'b', 'c'] -%}
        |sum({{ c }}) AS {{ c }}_{{ suffix }}{% if not loop.last %}, {% endif %}
        |{%- endfor %}{% endmacro %}""".stripMargin
    assert(MacroRenderer.render("SELECT {{ sums(tot) }} FROM t", macros) ==
      "SELECT sum(a) AS a_tot, sum(b) AS b_tot, sum(c) AS c_tot FROM t")
  }

  test("{% for %} binds loop.index/index0/revindex/revindex0/first/last/length") {
    val macros =
      """{% macro idx() %}{% for x in [10, 20] -%}
        |[{{ loop.index }}:{{ loop.index0 }}:{{ loop.first }}:{{ loop.last }}:{{ loop.length }}:{{ x }}]
        |{%- endfor %}{% endmacro %}"""
        .stripMargin
    assert(MacroRenderer.render("{{ idx() }}", "" + macros) ==
      "[1:0:true:false:2:10][2:1:false:true:2:20]")
    assert(MacroRenderer.render(
      "{% for x in [7, 8, 9] %}{{ loop.revindex }}/{{ loop.revindex0 }};{% endfor %}",
      "") == "3/2;2/1;1/0;")
  }

  test("{% if %} truthiness and comparisons over bound params") {
    val macros =
      """{% macro col(agg) %}{% if agg == 'sum' %}sum(v){% elif agg == 'avg' %}avg(v){% else %}count(*){% endif %}{% endmacro %}
        |{% macro opt(flag) %}{% if flag %}WITH_FLAG{% else %}NO_FLAG{% endif %}{% endmacro %}""".stripMargin
    assert(MacroRenderer.render("SELECT {{ col('sum') }}", macros) == "SELECT sum(v)")
    assert(MacroRenderer.render("SELECT {{ col('avg') }}", macros) == "SELECT avg(v)")
    assert(MacroRenderer.render("SELECT {{ col('max') }}", macros) == "SELECT count(*)")
    // truthiness after untyped binding: true/1 truthy; false/0/'' falsy
    assert(MacroRenderer.render("{{ opt(true) }}", macros) == "WITH_FLAG")
    assert(MacroRenderer.render("{{ opt(1) }}", macros) == "WITH_FLAG")
    assert(MacroRenderer.render("{{ opt(false) }}", macros) == "NO_FLAG")
    assert(MacroRenderer.render("{{ opt(0) }}", macros) == "NO_FLAG")
    assert(MacroRenderer.render("{{ opt('') }}", macros) == "NO_FLAG")
  }

  test("{% if x in [...] %} membership and nested control structures") {
    val macros =
      """{% macro pick(c) %}{% if c in ['a', 'b'] %}{% for s in ['x', 'y'] %}{{ c }}{{ s }} {% endfor %}{% else %}none{% endif %}{% endmacro %}""".stripMargin
    assert(MacroRenderer.render("{{ pick(a) }}", macros).trim == "ax ay")
    assert(MacroRenderer.render("{{ pick(z) }}", macros).trim == "none")
  }

  test("top-level {% for %} multiplies macro calls before expansion") {
    // the loop must expand BEFORE the call fixpoint or f(c) would bind the
    // literal text "c" instead of each item
    val macros = "{% macro f(c) %}sum({{ c }}) AS {{ c }}_sum{% endmacro %}"
    val src =
      "SELECT {% for c in ['q', 'r'] %}{{ f(c) }}{% if not loop.last %}, {% endif %}{% endfor %} FROM t"
    assert(MacroRenderer.render(src, macros) ==
      "SELECT sum(q) AS q_sum, sum(r) AS r_sum FROM t")
    // top-level {% if %} with an undefined name: non-strict false
    assert(MacroRenderer.render(
      "SELECT 1{% if undefined_flag %}, 2{% endif %}", "") == "SELECT 1")
  }

  test("macro-call arguments may contain nested parens and calls") {
    // `([^)]*)`-style arg matching could never span sum(x) — the call
    // then leaked raw {{ … }} into the SQL
    val m = "{% macro money(e) %}round({{ e }}, 2){% endmacro %}"
    assert(MacroRenderer.render("SELECT {{ money(sum(amount)) }} FROM t", m)
      == "SELECT round(sum(amount), 2) FROM t")
    // a nested-call argument with a comma inside ITS parens stays one arg
    assert(MacroRenderer.render(
      "SELECT {{ money(coalesce(a, b)) }} FROM t", m) ==
      "SELECT round(coalesce(a, b), 2) FROM t")
    // dotted loop variables substitute inside nested-call arguments
    val fm = "{% macro fmt(i) %}c{{ i }}{% endmacro %}" +
      "{% macro cols() %}{% for x in ['p', 'q'] %}{{ fmt(loop.index) }}" +
      "{% if not loop.last %}, {% endif %}{% endfor %}{% endmacro %}"
    assert(MacroRenderer.render("SELECT {{ cols() }} FROM t", fm) ==
      "SELECT c1, c2 FROM t")
    // filtered slots accept whitespace-trim markers instead of leaking
    val tm = "{% macro tag(s) %}{{- s | upper -}}{% endmacro %}"
    assert(MacroRenderer.render("SELECT '{{ tag(ab) }}'", tm) ==
      "SELECT 'AB'")
    // an unterminated macro block fails NAMED (it used to silently delete
    // the rest of the file)
    val e = intercept[GenericError](MacroRenderer.render(
      "{% macro broken(x) %}{{ x }}{% end_macro %}SELECT 1", ""))
    assert(e.getMessage.contains("endmacro"))
  }

  test("{% set %} binds literals, names, filtered values; leaks from if") {
    // literal assignment, used later in the same block
    assert(MacroRenderer.render(
      "{% set lim = 100 %}SELECT * FROM t WHERE x > {{ lim }}", "") ==
      "SELECT * FROM t WHERE x > 100")
    // string literal + filter pipe
    assert(MacroRenderer.render(
      "{% set s = 'ab-cd' | upper | replace('-', '_') %}SELECT '{{ s }}'", "") ==
      "SELECT 'AB_CD'")
    // list literal + join filter
    assert(MacroRenderer.render(
      "{% set cols = ['a', 'b', 'c'] | join(', ') %}SELECT {{ cols }} FROM t",
      "") == "SELECT a, b, c FROM t")
    // list binding drives a later {% for %}
    assert(MacroRenderer.render(
      "{% set cs = ['q', 'r'] %}SELECT {% for c in cs %}sum({{ c }})" +
        "{% if not loop.last %}, {% endif %}{% endfor %} FROM t", "") ==
      "SELECT sum(q), sum(r) FROM t")
    // jinja scoping: if is NOT a scope — a set inside a branch leaks out
    assert(MacroRenderer.render(
      "{% if true %}{% set x = 'yes' %}{% else %}{% set x = 'no' %}{% endif %}" +
        "SELECT '{{ x }}'", "") == "SELECT 'yes'")
    // ...but a for body IS a scope: per-iteration bindings don't escape
    assert(MacroRenderer.render(
      "{% for i in [1, 2] %}{% set y = i %}{% endfor %}SELECT 1{{ y }}", "") ==
      "SELECT 1")
    // inside a macro body, over a bound param
    val m = "{% macro f(c) %}{% set u = c | upper %}{{ u }}_{{ u }}{% endmacro %}"
    assert(MacroRenderer.render("SELECT {{ f(ab) }}", m) == "SELECT AB_AB")
    // rebinding takes the latest value
    assert(MacroRenderer.render(
      "{% set v = 1 %}{% set v = 2 %}SELECT {{ v }}", "") == "SELECT 2")
    // undefined RHS fails named
    val e1 = intercept[GenericError](
      MacroRenderer.render("{% set x = undefined_name %}SELECT {{ x }}", ""))
    assert(e1.getMessage.contains("undefined"))
    // the block form binds the rendered body (full coverage in the
    // dedicated endset test below)
    assert(MacroRenderer.render(
      "{% set x %}abc{% endset %}SELECT '{{ x }}'", "") == "SELECT 'abc'")
  }

  test("unsupported tags and malformed blocks fail with a named error") {
    // {% include %} is minijinja, not the supported subset: named failure,
    // not tags leaking through into SQL
    val e1 = intercept[GenericError](
      MacroRenderer.render("{% include 'other.sql' %}SELECT 1", ""))
    assert(e1.getMessage.contains("include"))
    val e2 = intercept[GenericError](
      MacroRenderer.render("SELECT 1{% if a %} oops", ""))
    assert(e2.getMessage.contains("endif"))
    val e3 = intercept[GenericError](
      MacroRenderer.render("{% for x in undefined_list %}{{ x }}{% endfor %}", ""))
    assert(e3.getMessage.contains("undefined"))
    val e4 = intercept[GenericError](
      MacroRenderer.render("SELECT 1{% endfor %}", ""))
    assert(e4.getMessage.contains("unexpected"))
  }

  test("jinja filters apply to macro params; unknown filters fail named") {
    val macros =
      """{% macro col(name) %}{{ name | upper }} AS {{ name | lower }}_u{% endmacro %}"""
    assert(MacroRenderer.render("SELECT {{ col(Price) }} FROM t", macros) ==
      "SELECT PRICE AS price_u FROM t")
    // replace + trim + literal base
    val m2 = """{% macro q(s) %}{{ s | trim | replace('-', '_') }}{% endmacro %}"""
    assert(MacroRenderer.render("SELECT {{ q(' a-b ') }} FROM t", m2) ==
      "SELECT a_b FROM t")
    // join over a list param bound from a literal list via {% for %} env is
    // out of scope here — join applies to list-typed bindings; string gets
    // a named error
    val bad = """{% macro j(s) %}{{ s | join(',') }}{% endmacro %}"""
    val e = intercept[GenericError](
      MacroRenderer.render("SELECT {{ j(x) }} FROM t", bad))
    assert(e.getMessage.contains("join"))
    // default() on an undefined top-level name produces the default; any
    // other filter on undefined fails named instead of leaking
    assert(MacroRenderer.render("SELECT {{ missing | default('0') }} AS d", "")
      == "SELECT 0 AS d")
    val e2 = intercept[GenericError](
      MacroRenderer.render("SELECT {{ missing | upper }} FROM t", ""))
    assert(e2.getMessage.contains("undefined"))
    // unknown filter name
    val e3 = intercept[GenericError](MacroRenderer.render(
      "SELECT {{ x | frobnicate }} FROM t",
      "{% macro id(x) %}{{ x | frobnicate }}{% endmacro %}"))
    assert(e3.getMessage.contains("frobnicate") ||
      e3.getMessage.contains("undefined"))
  }

  test("{% set x %}…{% endset %} block form binds the rendered body") {
    // body renders with the current scope; inner tags run; the binding is
    // usable downstream like any other set var
    assert(MacroRenderer.render(
      """{% set cols %}a{% for i in [1, 2] %}, c{{ i }}{% endfor %}{% endset %}
        |SELECT {{ cols }} FROM t""".stripMargin, "") ==
      "SELECT a, c1, c2 FROM t")
    // block body is its own scope: an inline set inside does NOT leak out,
    // and does not disturb the block/endset pairing
    assert(MacroRenderer.render(
      """{% set s %}{% set inner = 'x' %}[{{ inner }}]{% endset %}
        |{{ s }}-{{ inner }}""".stripMargin, "") == "[x]-")
    // nested block sets pair by depth
    assert(MacroRenderer.render(
      """{% set outer %}{% set innerb %}deep{% endset %}({{ innerb }}){% endset %}
        |{{ outer }}""".stripMargin, "") == "(deep)")
    val e = intercept[GenericError](
      MacroRenderer.render("{% set x %}never closed", ""))
    assert(e.getMessage.contains("endset"))
    // regression (found by MacroRendererProps): a block bound under an
    // EMPTY env must capture the RENDERED body — a later filter on the
    // variable operates on the value, never on raw jinja text
    assert(MacroRenderer.render(
      """{% set s %}xm{{ 'vqhs' | upper }}{% endset %}
        |{% for x in [s] %}{{ x | replace('m', 'Z') }}{% endfor %}""".stripMargin,
      "") == "xZVQHS")
  }

  test("{% for %} over range(): 1/2/3-arg, negative step, named errors") {
    assert(MacroRenderer.render(
      "{% for i in range(3) %}{{ i }};{% endfor %}", "") == "0;1;2;")
    assert(MacroRenderer.render(
      "{% for i in range(1, 4) %}{{ i }}{% endfor %}", "") == "123")
    assert(MacroRenderer.render(
      "{% for i in range(5, 0, -2) %}{{ i }},{% endfor %}", "") == "5,3,1,")
    assert(MacroRenderer.render( // empty range renders nothing
      "{% for i in range(0) %}x{% endfor %}ok", "") == "ok")
    // bounds may come from in-scope names (macro params, set vars)
    assert(MacroRenderer.render(
      """{% set n = '2' %}{% for i in range(n) %}p{{ i }} {% endfor %}""",
      "") == "p0 p1")
    val e = intercept[GenericError](MacroRenderer.render(
      "{% for i in range(1, 2, 0) %}x{% endfor %}", ""))
    assert(e.getMessage.contains("step"))
    val e2 = intercept[GenericError](MacroRenderer.render(
      "{% for i in range(zz) %}x{% endfor %}", ""))
    assert(e2.getMessage.contains("undefined"))
  }

  test("range() extreme bounds fail as the NAMED error, never a raw " +
      "NumberFormatException or a silently-wrong range") {
    // integer beyond Long range: named error, not NumberFormatException
    val e1 = intercept[GenericError](MacroRenderer.render(
      "{% for i in range(99999999999999999999) %}x{% endfor %}", ""))
    assert(e1.getMessage.contains("integer range"))
    // hi - lo overflows Long: the count formula must not wrap into a
    // small (or empty) range — named runaway error instead
    val e2 = intercept[GenericError](MacroRenderer.render(
      s"{% for i in range(${Long.MinValue / 2}, ${Long.MaxValue / 2 + 10}) %}x{% endfor %}",
      ""))
    assert(e2.getMessage.contains("runaway"))
    // still-huge but non-overflowing count keeps the existing named error
    val e3 = intercept[GenericError](MacroRenderer.render(
      "{% for i in range(10000000) %}x{% endfor %}", ""))
    assert(e3.getMessage.contains("runaway"))
  }
}
