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

  /** Parse every `{% macro %}…{% endmacro %}` block in `src`. A header
    * with no matching `{% endmacro %}` fails NAMED — silently treating
    * the rest of the file as macro body deleted every later statement.
    */
  def parseMacros(src: String): Map[String, MacroDef] = {
    val defs = mutable.Map[String, MacroDef]()
    var rest = src
    var m = macroStart.findFirstMatchIn(rest)
    while (m.isDefined) {
      val mm = m.get
      val name = mm.group(1)
      val paramList = mm.group(2).trim
      val afterHeader = rest.substring(mm.end)
      val endM = macroEnd.findFirstMatchIn(afterHeader).getOrElse(
        unsupportedJinja(s"missing {% endmacro %} for macro `$name`"))
      val body = afterHeader.substring(0, endM.start)
      val params = Seq.newBuilder[String]
      val defaults = mutable.Map[String, String]()
      if (paramList.nonEmpty) paramList.split(",").foreach { p =>
        p.split("=", 2) match {
          case Array(n, d) => params += n.trim; defaults(n.trim) = unquote(d.trim)
          case Array(n)    => params += n.trim
        }
      }
      defs(name) = MacroDef(name, params.result(), defaults.toMap, body.trim)
      rest = afterHeader.substring(endM.end)
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
      val endM = macroEnd.findFirstMatchIn(afterHeader).getOrElse(
        unsupportedJinja(s"missing {% endmacro %} for macro `${mm.group(1)}`"))
      rest = afterHeader.substring(endM.end)
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

  // header of a call; the ARGS are scanned with a balanced-paren walk —
  // a regex `([^)]*)` body could never span a nested call like
  // `{{ money(sum(x)) }}`, leaving raw jinja to leak into the SQL
  private val callOpenPat = """\{\{-?\s*(\w+)\s*\(""".r
  private val callClosePat = """^\s*-?\}\}""".r
  // dotted names cover the loop.* variables bound inside {% for %} bodies
  private val varPat = """\{\{-?\s*([A-Za-z_][\w.]*)\s*-?\}\}""".r

  /** The next `{{ name(args) }}` call at or after `from`, with
    * balanced-paren quote-aware args: (start, end, name, argStr).
    */
  private def findCall(text: String, from: Int)
      : Option[(Int, Int, String, String)] = {
    callOpenPat.findAllMatchIn(text).filter(_.start >= from).foreach { m =>
      var i = m.end; var depth = 1; var inQ = false; var q = ' '
      while (i < text.length && depth > 0) {
        val c = text.charAt(i)
        if (inQ) { if (c == q) inQ = false }
        else if (c == '\'' || c == '"') { inQ = true; q = c }
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        i += 1
      }
      if (depth == 0)
        callClosePat.findFirstMatchIn(text.substring(i)).foreach { cm =>
          return Some((m.start, i + cm.end, m.group(1),
            text.substring(m.end, i - 1)))
        }
    }
    None
  }

  /** Render `src` with macros from `macroSrc` ++ those defined inline.
    * Macro-call expansion runs to a fixpoint (bounded) so macros may call
    * macros; remaining bare `{{ name }}` of unknown names become "".
    */
  def render(src: String, macroSrc: String): String =
    render(src, parseMacros(macroSrc))

  /** [[render]] over PRE-PARSED macros: buildGraph parses the shared
    * macro files once instead of re-scanning them per model.
    */
  def render(src: String, fileMacros: Map[String, MacroDef]): String = {
    val macros = fileMacros ++ parseMacros(src)
    // control tags FIRST: a top-level {% for %} must multiply the macro
    // calls inside its body before the call-expansion fixpoint sees them
    var cur = renderTags(stripMacroDefs(src), Map.empty)
    var depth = 0
    var changed = true
    while (changed && depth < 16) {
      changed = false
      val sb = new StringBuilder
      var pos = 0
      var found = findCall(cur, pos)
      while (found.isDefined) {
        val (s, e, name, argStr) = found.get
        sb.append(cur.substring(pos, s))
        macros.get(name) match {
          case Some(mac) => sb.append(expand(mac, argStr))
          case None      => () // undefined call → empty, jinja non-strict
        }
        changed = true
        pos = e
        found = findCall(cur, pos)
      }
      sb.append(cur.substring(pos))
      cur = sb.toString
      depth += 1
    }
    // Filtered slots at top level: default(…) may still produce a value;
    // any other filter on an undefined name fails named (minijinja errors
    // there too — never leak `{{ … }}` into the SQL)
    val filtered = filteredVarPat.replaceAllIn(cur, m =>
      java.util.regex.Matcher.quoteReplacement(
        applyFilters(m.group(1), m.group(2), Map.empty)))
    // Undefined bare variables → empty (empty render context, node.rs:100-106)
    varPat.replaceAllIn(filtered, _ => "").trim
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
    // control tags ({% if %}/{% for %}) render with the bound params in
    // scope; {{ p }} slots and nested macro-call arguments substitute in
    // the same pass (see subst)
    renderTags(mac.body, bound.map { case (k, v) => k -> JStr(v) }.toMap)
  }

  // --- jinja control structures ({% if %} / {% for %}) ---------------------
  // The reference renders with full minijinja (/root/reference/src/node.rs:
  // 100-106; minijinja = "1.0.12", Cargo.toml:15), so control tags are legal
  // anywhere in a model — but with the EMPTY top-level context the only
  // places a tag can see a defined name are macro bodies (params) and
  // literal lists. Implemented subset; any other tag FAILS with a named
  // GenericError instead of leaking `{% … %}` text into the SQL:
  //   {% for x in [a, 'b', 1] %} … {% endfor %}
  //     list items: quoted/numeric literals or in-scope names; the body sees
  //     loop.index / loop.index0 / loop.revindex / loop.revindex0 /
  //     loop.first / loop.last / loop.length
  //   {% if cond %} … {% elif cond %} … {% else %} … {% endif %}
  //     cond: atom | not cond | atom ==|!= atom | atom in list-or-string
  //     truthiness: undefined, '', 'false', '0', 'none' are false — the
  //     minijinja falsy values as they appear after untyped string binding
  //   {% set name = expr %}
  //     expr: atom (literal / list / in-scope name), optionally filtered
  //     (`{% set x = y | upper %}`). Bindings persist for the REST of the
  //     enclosing block and — like jinja, where `if` is not a scope — leak
  //     out of {% if %} branches; a {% for %} body is a scope, so
  //     assignments there stay per-iteration.
  //   {% set name %} … {% endset %}
  //     block form: binds `name` to the RENDERED body (tags and slots
  //     inside render with the current scope; the body is its own scope,
  //     so inner {% set %}s do not leak out).
  //   {% for x in range(n) %} / range(a, b) / range(a, b, step)
  //     minijinja's integer ranges (end-exclusive, step may be negative);
  //     bounds are literals or in-scope numeric strings.
  //   {%- … -%} trims whitespace toward the tag, minijinja-style.

  private sealed trait JVal
  private final case class JStr(s: String) extends JVal
  private final case class JList(xs: Seq[String]) extends JVal

  private type Tok = scala.util.matching.Regex.Match

  private val tagRe = """(?s)\{%(-?)\s*(\w+)\s*(.*?)\s*(-?)%\}""".r
  private val nameRe = """^[A-Za-z_][\w.]*$""".r
  private val numRe = """^-?\d+(\.\d+)?$""".r

  private def unsupportedJinja(detail: String): Nothing =
    throw GenericError("jinja render: " + detail + "; supported: " +
      "{% for x in [..] %}…{% endfor %}, {% if %}/{% elif %}/{% else %}/" +
      "{% endif %} with not/==/!=/in conditions, {% set name = expr %}")

  private def renderTags(text: String, env: Map[String, JVal]): String =
    renderTagsEnv(text, env)._1

  /** Render all control tags in `text` with `env` in scope; text between
    * tags is substituted via [[subst]]. Tag-free text with an empty env
    * passes through verbatim. Returns the rendered text AND the env after
    * `{% set %}` bindings, so an enclosing `{% if %}` can propagate them
    * (jinja: `if` is not a scope).
    */
  private def renderTagsEnv(text: String, env0: Map[String, JVal])
      : (String, Map[String, JVal]) = {
    var env = env0
    val toks = tagRe.findAllMatchIn(text).toList
    if (toks.isEmpty) return (subst(text, env), env)
    val sb = new StringBuilder
    var from = 0
    var trimNext = false
    var rest = toks
    def appendText(upTo: Int, trimRight: Boolean): Unit = {
      var seg = text.substring(from, upTo)
      if (trimNext) { seg = seg.replaceFirst("^\\s+", ""); trimNext = false }
      if (trimRight) seg = seg.replaceFirst("\\s+$", "")
      sb.append(subst(seg, env))
    }
    while (rest.nonEmpty) {
      val m = rest.head
      m.group(2) match {
        case "for" =>
          appendText(m.start, m.group(1) == "-")
          val (endTok, after) = matchEnd(rest.tail, "for", "endfor")
          val body = trimBody(text.substring(m.end, endTok.start),
            m.group(4) == "-", endTok.group(1) == "-")
          sb.append(renderFor(m.group(3), body, env))
          trimNext = endTok.group(4) == "-"
          from = endTok.end
          rest = after
        case "if" =>
          appendText(m.start, m.group(1) == "-")
          val (branches, endTok, after) = splitIf(text, m, rest.tail)
          branches.collectFirst {
            case (cond, body) if cond.forall(evalCond(_, env)) => body
          }.foreach { b =>
            val (rendered, envAfter) = renderTagsEnv(b, env)
            sb.append(rendered)
            env = envAfter // {% set %} inside a branch leaks out, like jinja
          }
          trimNext = endTok.group(4) == "-"
          from = endTok.end
          rest = after
        case "set" if m.group(3).trim.matches("""\w+""") =>
          // block form: bind the name to the RENDERED body. Depth counts
          // only other BLOCK-form sets — an inline {% set x = … %} inside
          // the body has no {% endset %} and must not shift the pairing.
          appendText(m.start, m.group(1) == "-")
          val (endTok, after) = {
            var depth = 0
            var r = rest.tail
            var found: Option[(Tok, List[Tok])] = None
            while (r.nonEmpty && found.isEmpty) {
              val t = r.head
              t.group(2) match {
                case "set" if t.group(3).trim.matches("""\w+""") => depth += 1
                case "endset" if depth > 0 => depth -= 1
                case "endset" => found = Some((t, r.tail))
                case _ => ()
              }
              r = r.tail
            }
            found.getOrElse(unsupportedJinja("missing {% endset %}"))
          }
          val body = trimBody(text.substring(m.end, endTok.start),
            m.group(4) == "-", endTok.group(1) == "-")
          // The body is its own scope (inner sets don't leak), rendered
          // with the CURRENT env in view — and FINISHED eagerly: with an
          // empty env, renderTags' subst shortcut defers {{ 'lit'|f }} and
          // bare-{{ name }} slots to render()'s final cleanup, but a
          // BINDING must capture the rendered text NOW (a filter applied
          // to the variable later would otherwise transform raw jinja
          // text — caught by MacroRendererProps). With a nonempty env the
          // two passes below are no-ops (subst already substituted).
          // Macro CALLS inside a block body stay deferred to the
          // expansion fixpoint, like every other call site.
          val rendered = varPat.replaceAllIn(
            filteredVarPat.replaceAllIn(renderTags(body, env), fm =>
              java.util.regex.Matcher.quoteReplacement(
                applyFilters(fm.group(1), fm.group(2), env))),
            _ => "")
          env = env + (m.group(3).trim -> JStr(rendered))
          trimNext = endTok.group(4) == "-"
          from = endTok.end
          rest = after
        case "set" =>
          appendText(m.start, m.group(1) == "-")
          env = env + parseSet(m.group(3), env)
          trimNext = m.group(4) == "-"
          from = m.end
          rest = rest.tail
        case k @ ("endfor" | "endif" | "elif" | "else" | "endset") =>
          unsupportedJinja(s"unexpected {% $k %}")
        case other =>
          unsupportedJinja(s"unsupported tag {% $other %}")
      }
    }
    appendText(text.length, trimRight = false)
    (sb.toString, env)
  }

  private val setExprRe = """(?s)^(\w+)\s*=\s*(.+)$""".r

  /** `{% set name = expr %}`: expr is an atom, optionally piped through
    * filters. The tag-without-`=` block form (`{% set x %}…{% endset %}`)
    * fails named, never silently drops.
    */
  private def parseSet(arg: String, env: Map[String, JVal]): (String, JVal) =
    arg.trim match {
      case setExprRe(name, rhs) =>
        val v = splitBinary(rhs.trim, "|") match {
          case Some((l, fs)) => JStr(applyFilters(l.trim, fs, env))
          case None => evalAtom(rhs.trim, env).getOrElse(
            unsupportedJinja(s"set: `${rhs.trim}` is undefined"))
        }
        name -> v
      case other => unsupportedJinja(
        s"set supports only `{% set name = expr %}`, got `$other`")
    }

  /** Matching close tag at the same nesting depth (tags pair by kind, so a
    * kind-specific counter is exact), and the tokens after it.
    */
  private def matchEnd(toks: List[Tok], open: String,
      close: String): (Tok, List[Tok]) = {
    var depth = 0
    var rest = toks
    while (rest.nonEmpty) {
      val t = rest.head
      val k = t.group(2)
      if (k == open) depth += 1
      else if (k == close) {
        if (depth == 0) return (t, rest.tail)
        depth -= 1
      }
      rest = rest.tail
    }
    unsupportedJinja(s"missing {% $close %}")
  }

  /** Split an if-block into (condition, body-text) branches — None is the
    * else branch — plus the endif token and the tokens after it.
    */
  private def splitIf(text: String, open: Tok, toks: List[Tok])
      : (Seq[(Option[String], String)], Tok, List[Tok]) = {
    val branches = Seq.newBuilder[(Option[String], String)]
    var condOpt: Option[String] = Some(open.group(3))
    var bodyStart = open.end
    var trimL = open.group(4) == "-"
    var seenElse = false
    var depth = 0
    var rest = toks
    def closeBranch(t: Tok): Unit =
      branches += condOpt -> trimBody(text.substring(bodyStart, t.start),
        trimL, t.group(1) == "-")
    while (rest.nonEmpty) {
      val t = rest.head
      t.group(2) match {
        case "if" => depth += 1
        case "endif" if depth > 0 => depth -= 1
        case "endif" =>
          closeBranch(t)
          return (branches.result(), t, rest.tail)
        case "elif" if depth == 0 =>
          if (seenElse) unsupportedJinja("elif after else")
          closeBranch(t)
          condOpt = Some(t.group(3)); bodyStart = t.end; trimL = t.group(4) == "-"
        case "else" if depth == 0 =>
          if (seenElse) unsupportedJinja("duplicate else")
          seenElse = true
          closeBranch(t)
          condOpt = None; bodyStart = t.end; trimL = t.group(4) == "-"
        case _ => ()
      }
      rest = rest.tail
    }
    unsupportedJinja("missing {% endif %}")
  }

  private val forExprRe = """(?s)^(\w+)\s+in\s+(.+)$""".r
  private val rangeRe = """^range\s*\((.*)\)$""".r

  /** minijinja integer range: range(n) = 0..n-1, range(a, b) end-exclusive,
    * range(a, b, step) with negative steps allowed. Bounds are numeric
    * literals or in-scope names holding numeric strings; anything else —
    * including a step of 0 or a runaway cardinality — fails named.
    */
  private def evalRange(argsText: String, env: Map[String, JVal]): Seq[String] = {
    def num(a: String): Long = evalAtom(a.trim, env) match {
      case Some(JStr(s)) if numRe.findFirstIn(s).isDefined && !s.contains('.') =>
        // beyond-Long integers (e.g. range(99999999999999999999)) must
        // fail as the named error, not a raw NumberFormatException
        try s.toLong
        catch { case _: NumberFormatException =>
          unsupportedJinja(s"range bound `$s` exceeds integer range") }
      case Some(JStr(s)) => unsupportedJinja(s"range bound `$s` is not an integer")
      case Some(JList(_)) => unsupportedJinja("range bound is a list")
      case None => unsupportedJinja(s"range bound `${a.trim}` is undefined")
    }
    val args = splitArgs(argsText).map(num)
    val (lo, hi, step) = args match {
      case Seq(n)        => (0L, n, 1L)
      case Seq(a, b)     => (a, b, 1L)
      case Seq(a, b, s)  => (a, b, s)
      case _ => unsupportedJinja("range takes 1-3 integer arguments")
    }
    if (step == 0) unsupportedJinja("range step must not be 0")
    // exact arithmetic: extreme bounds (e.g. range(-2^62, 2^62)) overflow
    // the count formula and would yield a WRONG (possibly empty) range
    // instead of the named runaway error
    val count = try math.max(0L, Math.addExact(
        Math.addExact(Math.subtractExact(hi, lo), step),
        if (step > 0) -1L else 1L) / step)
      catch { case _: ArithmeticException =>
        unsupportedJinja("range bounds overflow — template runaway?") }
    if (count > 100000)
      unsupportedJinja(s"range of $count items — template runaway?")
    Iterator.iterate(lo)(_ + step).take(count.toInt).map(_.toString).toSeq
  }

  private def renderFor(expr: String, body: String,
      env: Map[String, JVal]): String = expr.trim match {
    case forExprRe(v, iterExpr) =>
      val items = iterExpr.trim match {
        case rangeRe(argsText) => evalRange(argsText, env)
        case it => evalAtom(it, env) match {
          case Some(JList(xs)) => xs
          case Some(JStr(s))   => unsupportedJinja(s"for over non-list value `$s`")
          case None            => unsupportedJinja(s"for over undefined `$it`")
        }
      }
      val n = items.size
      items.zipWithIndex.map { case (item, i) =>
        renderTags(body, env ++ Map(
          v -> JStr(item),
          "loop.index" -> JStr((i + 1).toString),
          "loop.index0" -> JStr(i.toString),
          "loop.revindex" -> JStr((n - i).toString),
          "loop.revindex0" -> JStr((n - i - 1).toString),
          "loop.first" -> JStr(if (i == 0) "true" else "false"),
          "loop.last" -> JStr(if (i == n - 1) "true" else "false"),
          "loop.length" -> JStr(n.toString)))
      }.mkString
    case other => unsupportedJinja(s"for expression `$other`")
  }

  private def evalCond(c0: String, env: Map[String, JVal]): Boolean = {
    val c = c0.trim
    if (c.isEmpty) unsupportedJinja("empty condition")
    if (c.matches("(?s)^not\\s.+")) return !evalCond(c.substring(3), env)
    splitBinary(c, "==") match {
      case Some((l, r)) => atomStr(l, env) == atomStr(r, env)
      case None => splitBinary(c, "!=") match {
        case Some((l, r)) => atomStr(l, env) != atomStr(r, env)
        case None => splitBinary(c, " in ") match {
          case Some((l, r)) =>
            val item = atomStr(l, env)
            item != null && (evalAtom(r.trim, env) match {
              case Some(JList(xs)) => xs.contains(item)
              case Some(JStr(s))   => s.contains(item)
              case None            => false
            })
          case None => evalAtom(c, env).exists(truthy)
        }
      }
    }
  }

  /** Atom as a comparison string; null marks undefined (so `x == y` is true
    * for two undefined names, matching jinja's undefined equality).
    */
  private def atomStr(a: String, env: Map[String, JVal]): String =
    evalAtom(a.trim, env) match {
      case Some(JStr(s))   => s
      case Some(JList(xs)) => xs.mkString(", ")
      case None            => null
    }

  private def truthy(v: JVal): Boolean = v match {
    case JStr(s) =>
      s.nonEmpty && !Set("false", "0", "none").contains(s.toLowerCase)
    case JList(xs) => xs.nonEmpty
  }

  /** Evaluate an atom: quoted/numeric literal, literal list, boolean
    * keyword, or in-scope name (None when undefined). Anything else fails
    * named — a silently-ignored expression would render wrong SQL.
    */
  private def evalAtom(a: String, env: Map[String, JVal]): Option[JVal] = {
    if (a.isEmpty) unsupportedJinja("empty expression")
    if (a.head == '[' && a.last == ']')
      Some(JList(splitArgs(a.substring(1, a.length - 1)).map { item =>
        val t = item.trim
        if (t.nonEmpty && (t.head == '\'' || t.head == '"')) unquote(t)
        else if (numRe.findFirstIn(t).isDefined) t
        else if (nameRe.findFirstIn(t).isDefined) env.get(t) match {
          case Some(JStr(s))   => s
          case Some(JList(xs)) => xs.mkString(", ")
          case None            => "" // undefined item → empty, non-strict
        }
        else unsupportedJinja(s"unsupported list item `$t`")
      }))
    else if (a.head == '\'' || a.head == '"') Some(JStr(unquote(a)))
    else if (numRe.findFirstIn(a).isDefined) Some(JStr(a))
    else if (nameRe.findFirstIn(a).isDefined) a.toLowerCase match {
      case "true"  => Some(JStr("true"))
      case "false" => Some(JStr("false"))
      case "none"  => Some(JStr(""))
      case _       => env.get(a)
    }
    else unsupportedJinja(s"unsupported expression `$a`")
  }

  /** First `op` outside quotes, splitting `c` into (left, right). */
  private def splitBinary(c: String, op: String): Option[(String, String)] = {
    var i = 0; var inQ = false; var q = ' '
    while (i + op.length <= c.length) {
      val ch = c.charAt(i)
      if (inQ) { if (ch == q) inQ = false; i += 1 }
      else if (ch == '\'' || ch == '"') { inQ = true; q = ch; i += 1 }
      else if (c.regionMatches(i, op, 0, op.length))
        return Some((c.substring(0, i), c.substring(i + op.length)))
      else i += 1
    }
    None
  }

  private def trimBody(s: String, trimLeft: Boolean, trimRight: Boolean): String = {
    var r = s
    if (trimLeft) r = r.replaceFirst("^\\s+", "")
    if (trimRight) r = r.replaceFirst("\\s+$", "")
    r
  }

  /** Substitute in-scope names into a tag-free text segment: {{ name }}
    * slots (unknown names → empty, jinja non-strict) and nested macro-call
    * arguments. With an empty env the text passes through untouched so the
    * top-level pass can't disturb pre-macro-expansion text.
    */
  private def subst(text: String, env: Map[String, JVal]): String = {
    if (env.isEmpty) return text
    val strs: Map[String, String] = env.map { case (k, v) => k -> (v match {
      case JStr(s)   => s
      case JList(xs) => xs.mkString(", ")
    })}
    val afterFiltered = filteredVarPat.replaceAllIn(text, m =>
      java.util.regex.Matcher.quoteReplacement(
        applyFilters(m.group(1), m.group(2), env)))
    val afterVars = varPat.replaceAllIn(afterFiltered, m =>
      java.util.regex.Matcher.quoteReplacement(strs.getOrElse(m.group(1), "")))
    // nested macro-call arguments substitute via the balanced-paren call
    // scan (regex args could not span a nested call)
    val sb = new StringBuilder
    var pos = 0
    var found = findCall(afterVars, pos)
    while (found.isDefined) {
      val (s, e, name, argStr) = found.get
      sb.append(afterVars.substring(pos, s))
      sb.append(s"{{ $name(${substParams(argStr, strs)}) }}")
      pos = e
      found = findCall(afterVars, pos)
    }
    sb.append(afterVars.substring(pos))
    sb.toString
  }

  // --- jinja filters -------------------------------------------------------
  // minijinja renders `{{ x | filter }}` anywhere (node.rs:100-106); the
  // subset below covers the filters macro bodies actually use on string/
  // list params. An unknown filter or a type mismatch FAILS named instead
  // of leaking `{{ … }}` text into the SQL (the control-tag contract).
  //   upper lower trim length join(sep) replace(a, b) default(v)

  // `-?` markers accepted like varPat/callPat: `{{- x | upper -}}` must
  // render, not leak raw jinja into the SQL
  private[pipeline] val filteredVarPat =
    """\{\{-?\s*([A-Za-z_]\w*|'[^']*'|"[^"]*")\s*((?:\|\s*[A-Za-z_]\w*(?:\([^()]*\))?\s*)+)-?\}\}""".r

  private def applyFilters(baseText: String, filtersText: String,
      env: Map[String, JVal]): String = {
    // evalAtom covers the filteredVarPat shapes (name / quoted literal) and
    // additionally lets {% set %} pipe list literals ([..] | join('-'))
    var v: Option[JVal] = evalAtom(baseText.trim, env)
    val filterRe = """([A-Za-z_]\w*)(?:\(([^()]*)\))?""".r
    filterRe.findAllMatchIn(filtersText).foreach { fm =>
      val fn = fm.group(1).toLowerCase
      val fargs = Option(fm.group(2)).map(splitArgs(_).map(a => unquote(a.trim)))
        .getOrElse(Seq.empty)
      def str: String = v match {
        case Some(JStr(s)) => s
        case Some(JList(_)) =>
          unsupportedJinja(s"filter `$fn` expects a string, got a list")
        case None => unsupportedJinja(
          s"`$baseText` is undefined (only `default(…)` may apply)")
      }
      v = fn match {
        case "default" =>
          if (v.isEmpty || v.contains(JStr("")))
            Some(JStr(fargs.headOption.getOrElse("")))
          else v
        case "upper"   => Some(JStr(str.toUpperCase))
        case "lower"   => Some(JStr(str.toLowerCase))
        case "trim"    => Some(JStr(str.trim))
        case "replace" =>
          if (fargs.size != 2) unsupportedJinja("replace(old, new) needs 2 args")
          Some(JStr(str.replace(fargs(0), fargs(1))))
        case "length" => v match {
          case Some(JList(xs)) => Some(JStr(xs.length.toString))
          case _               => Some(JStr(str.length.toString))
        }
        case "join" => v match {
          case Some(JList(xs)) =>
            Some(JStr(xs.mkString(fargs.headOption.getOrElse(""))))
          case _ => unsupportedJinja("join(sep) expects a list")
        }
        case other => unsupportedJinja(s"unsupported filter `$other`")
      }
    }
    v match {
      case Some(JStr(s))   => s
      case Some(JList(xs)) => xs.mkString(", ")
      case None            => unsupportedJinja(s"`$baseText` is undefined")
    }
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
        // scan a DOTTED name so `loop.index` resolves as the whole bound
        // key (the env binds dotted names); a plain-word scan tokenized it
        // as `loop` + `index`, neither bound, and leaked the literal text
        var j = i
        while (j < text.length && (Character.isJavaIdentifierPart(text.charAt(j)) ||
          text.charAt(j) == '.')) j += 1
        while (j > i && text.charAt(j - 1) == '.') j -= 1 // trailing dots
        val w = text.substring(i, j)
        sb.append(bound.get(w).getOrElse(
          // not bound as a whole: substitute each dotted segment (a bound
          // alias prefix like t.col still rewrites its `t`)
          w.split('.').map(seg => bound.getOrElse(seg, seg)).mkString(".")))
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split a call's argument list on top-level commas — outside quotes
    * AND outside parens/brackets, so one argument may be a nested call
    * (`outer(concat(a, b))`) or a list literal without splintering.
    */
  private def splitArgs(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false; var q = ' '; var depth = 0
    s.foreach { c =>
      if (inQ) { cur.append(c); if (c == q) inQ = false }
      else if (c == '\'' || c == '"') { inQ = true; q = c; cur.append(c) }
      else if (c == '(' || c == '[') { depth += 1; cur.append(c) }
      else if (c == ')' || c == ']') { depth -= 1; cur.append(c) }
      else if (c == ',' && depth == 0) { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
