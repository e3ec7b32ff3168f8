package graft.pipeline

import scala.collection.mutable

/** Minimal jinja-macro renderer.
  *
  * The reference concatenates every macro file ahead of each model source and
  * renders with minijinja and an EMPTY context (/root/reference/src/node.rs:
  * 79-106), so the only usable jinja feature is
  * `{% macro name(a, b=default) %} … {% endmacro %}` + `{{ name(args) }}`
  * calls. We implement exactly that subset natively: no third-party dep, and
  * rendering stays a pure driver-side string transform.
  *
  * Supported:
  *   - positional and keyword call args, defaults in the signature
  *   - `{{ param }}` substitution inside macro bodies
  *   - nested macro calls (expanded to a fixpoint, bounded depth)
  * Unknown `{{ … }}` expressions render as empty string, matching jinja's
  * empty-context behavior for undefined names in non-strict mode.
  */
object MacroRenderer {

  final case class MacroDef(name: String, params: Seq[String],
      defaults: Map[String, String], body: String)

  private val macroStart =
    """(?s)\{%-?\s*macro\s+(\w+)\s*\(([^)]*)\)\s*-?%\}""".r
  private val macroEnd = """\{%-?\s*endmacro\s*-?%\}""".r

  /** Parse every `{% macro %}…{% endmacro %}` block in `src`. */
  def parseMacros(src: String): Map[String, MacroDef] = {
    val defs = mutable.Map[String, MacroDef]()
    var rest = src
    var m = macroStart.findFirstMatchIn(rest)
    while (m.isDefined) {
      val mm = m.get
      val name = mm.group(1)
      val paramList = mm.group(2).trim
      val afterHeader = rest.substring(mm.end)
      val endM = macroEnd.findFirstMatchIn(afterHeader)
      val body = endM.map(e => afterHeader.substring(0, e.start)).getOrElse("")
      val params = Seq.newBuilder[String]
      val defaults = mutable.Map[String, String]()
      if (paramList.nonEmpty) paramList.split(",").foreach { p =>
        p.split("=", 2) match {
          case Array(n, d) => params += n.trim; defaults(n.trim) = unquote(d.trim)
          case Array(n)    => params += n.trim
        }
      }
      defs(name) = MacroDef(name, params.result(), defaults.toMap, body.trim)
      rest = endM.map(e => afterHeader.substring(e.end)).getOrElse("")
      m = macroStart.findFirstMatchIn(rest)
    }
    defs.toMap
  }

  /** Remove macro definition blocks, leaving the rest of the text. */
  def stripMacroDefs(src: String): String = {
    val sb = new StringBuilder
    var rest = src
    var m = macroStart.findFirstMatchIn(rest)
    while (m.isDefined) {
      val mm = m.get
      sb.append(rest.substring(0, mm.start))
      val afterHeader = rest.substring(mm.end)
      val endM = macroEnd.findFirstMatchIn(afterHeader)
      rest = endM.map(e => afterHeader.substring(e.end)).getOrElse("")
      m = macroStart.findFirstMatchIn(rest)
    }
    sb.append(rest)
    sb.toString
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
        ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else s

  private val callPat = """\{\{-?\s*(\w+)\s*\(([^)]*)\)\s*-?\}\}""".r
  private val varPat = """\{\{-?\s*(\w+)\s*-?\}\}""".r

  /** Render `src` with macros from `macroSrc` ++ those defined inline.
    * Macro-call expansion runs to a fixpoint (bounded) so macros may call
    * macros; remaining bare `{{ name }}` of unknown names become "".
    */
  def render(src: String, macroSrc: String): String = {
    val macros = parseMacros(macroSrc) ++ parseMacros(src)
    var cur = stripMacroDefs(src)
    var depth = 0
    var changed = true
    while (changed && depth < 16) {
      val next = callPat.replaceAllIn(cur, m => {
        val name = m.group(1)
        macros.get(name) match {
          case Some(mac) =>
            java.util.regex.Matcher.quoteReplacement(expand(mac, m.group(2)))
          case None => "" // undefined call → empty, jinja non-strict
        }
      })
      changed = next != cur
      cur = next
      depth += 1
    }
    // Undefined bare variables → empty (empty render context, node.rs:100-106)
    varPat.replaceAllIn(cur, _ => "").trim
  }

  private def expand(mac: MacroDef, argStr: String): String = {
    val args = splitArgs(argStr)
    val bound = mutable.Map[String, String]() ++= mac.defaults
    var pos = 0
    args.foreach { a =>
      a.split("=", 2) match {
        case Array(k, v) if mac.params.contains(k.trim) =>
          bound(k.trim) = unquote(v.trim)
        case _ =>
          if (pos < mac.params.length) bound(mac.params(pos)) = unquote(a.trim)
          pos += 1
      }
    }
    // substitute params in plain {{ p }} slots AND inside nested macro-call
    // arguments ({{ inner(p) }}), so macros can pass their params through
    val afterVars = varPat.replaceAllIn(mac.body, m =>
      java.util.regex.Matcher.quoteReplacement(bound.getOrElse(m.group(1), "")))
    callPat.replaceAllIn(afterVars, m => {
      java.util.regex.Matcher.quoteReplacement(
        s"{{ ${m.group(1)}(${substParams(m.group(2), bound)}) }}")
    })
  }

  /** Substitute bound params in a nested call's argument text: one
    * quote-aware pass with ALL params substituted simultaneously — a
    * sequential replaceAll would re-substitute an argument whose text
    * matches a later parameter name (the capture bug DialectShim's macro
    * expansion also guards against), and would rewrite matches inside
    * quoted literals.
    */
  private def substParams(text: String,
      bound: collection.Map[String, String]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"') {
        val j = text.indexOf(c, i + 1)
        val end = if (j < 0) text.length else j + 1
        sb.append(text.substring(i, end)); i = end
      } else if (Character.isJavaIdentifierStart(c)) {
        var j = i
        while (j < text.length && Character.isJavaIdentifierPart(text.charAt(j))) j += 1
        val w = text.substring(i, j)
        sb.append(bound.getOrElse(w, w))
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split a call's argument list on commas outside quotes. */
  private def splitArgs(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false; var q = ' '
    s.foreach { c =>
      if (inQ) { cur.append(c); if (c == q) inQ = false }
      else if (c == '\'' || c == '"') { inQ = true; q = c; cur.append(c) }
      else if (c == ',') { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
