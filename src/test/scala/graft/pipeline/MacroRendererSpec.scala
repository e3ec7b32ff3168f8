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
}
