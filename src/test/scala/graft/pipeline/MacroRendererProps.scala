package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based fuzzing for [[MacroRenderer]] (VERDICT r7 task #7) —
  * the DialectShimProps treatment for the jinja subset.
  *
  * Each generated case is a small template AST (text / {{ var }} /
  * filtered slots / {% set %} / {% for %} / {% if %}/{% elif %}/{% else %}
  * / macro calls with positional+keyword args and defaults) together with
  * its EXPECTED rendering, computed by a model evaluator written here
  * directly from the jinja/minijinja semantics the renderer documents
  * (undefined names render empty, `if` is not a scope but `for` bodies
  * are, loop.* bindings, untyped-string truthiness, default() on
  * empty/undefined). The property asserts render == model for hundreds of
  * nestings the hand-written MacroRendererSpec cases can't enumerate; a
  * second property pins that rendered output is a fixpoint (no jinja
  * remnants ever leak into SQL), and a third round-trips parseMacros.
  */
object MacroRendererProps extends Properties("MacroRendererDiff") {

  // 250 + 250 + 100 = 600 generated cases per run
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(250)

  // --- model AST -----------------------------------------------------------
  private sealed trait Atom
  private final case class ALit(v: String) extends Atom
  private final case class ANum(v: String) extends Atom
  private final case class AName(n: String) extends Atom
  private final case class AKw(k: String) extends Atom // true/false/none

  private sealed trait Cond
  private final case class CTruth(a: Atom) extends Cond
  private final case class CNot(a: Atom) extends Cond
  private final case class CEq(l: Atom, r: Atom) extends Cond
  private final case class CNe(l: Atom, r: Atom) extends Cond
  private final case class CInList(l: Atom, items: Seq[Atom]) extends Cond
  private final case class CInStr(l: Atom, s: String) extends Cond

  private type Filters = Seq[(String, Seq[String])]

  private sealed trait Frag
  private final case class FText(s: String) extends Frag
  private final case class FVar(n: String) extends Frag
  private final case class FFilt(base: Either[String, String],
      filters: Filters) extends Frag
  private final case class FSet(n: String, lit: String,
      filters: Filters) extends Frag
  private final case class FSetBlock(n: String, body: List[Frag]) extends Frag
  private final case class FForRange(v: String, lo: Long, hi: Long,
      step: Long, body: List[Frag]) extends Frag
  private final case class FFor(v: String, items: Seq[Atom],
      body: List[Frag]) extends Frag
  private final case class FIf(
      branches: Seq[(Option[Cond], List[Frag])]) extends Frag
  private final case class FCall(target: String, pos: Seq[Atom],
      kw: Seq[(String, String)]) extends Frag

  private final case class MacroG(name: String, params: Seq[String],
      defaults: Map[String, String], body: List[Frag])

  // --- template text -------------------------------------------------------
  private def atomText(a: Atom): String = a match {
    case ALit(v)  => s"'$v'"
    case ANum(v)  => v
    case AName(n) => n
    case AKw(k)   => k
  }

  private def condText(c: Cond): String = c match {
    case CTruth(a)      => atomText(a)
    case CNot(a)        => s"not ${atomText(a)}"
    case CEq(l, r)      => s"${atomText(l)} == ${atomText(r)}"
    case CNe(l, r)      => s"${atomText(l)} != ${atomText(r)}"
    case CInList(l, is) =>
      s"${atomText(l)} in [${is.map(atomText).mkString(", ")}]"
    case CInStr(l, s)   => s"${atomText(l)} in '$s'"
  }

  private def filtText(fs: Filters): String =
    fs.map { case (f, as) =>
      "| " + f +
        (if (as.nonEmpty) as.map(a => s"'$a'").mkString("(", ", ", ")")
         else "")
    }.mkString(" ")

  private def textOf(frags: Seq[Frag]): String = frags.map {
    case FText(s) => s
    case FVar(n)  => s"{{ $n }}"
    case FFilt(base, fs) =>
      val b = base.fold(l => s"'$l'", identity)
      s"{{ $b ${filtText(fs)} }}"
    case FSet(n, lit, fs) =>
      if (fs.isEmpty) s"{% set $n = '$lit' %}"
      else s"{% set $n = '$lit' ${filtText(fs)} %}"
    case FSetBlock(n, body) =>
      s"{% set $n %}${textOf(body)}{% endset %}"
    case FForRange(v, lo, hi, step, body) =>
      val args = if (step == 1 && lo == 0) s"$hi"
                 else if (step == 1) s"$lo, $hi"
                 else s"$lo, $hi, $step"
      s"{% for $v in range($args) %}${textOf(body)}{% endfor %}"
    case FFor(v, items, body) =>
      s"{% for $v in [${items.map(atomText).mkString(", ")}] %}" +
        s"${textOf(body)}{% endfor %}"
    case FIf(branches) =>
      val sb = new StringBuilder
      branches.zipWithIndex.foreach { case ((cond, body), i) =>
        val tag = (cond, i) match {
          case (Some(c), 0) => s"{% if ${condText(c)} %}"
          case (Some(c), _) => s"{% elif ${condText(c)} %}"
          case (None, _)    => "{% else %}"
        }
        sb.append(tag).append(textOf(body))
      }
      sb.append("{% endif %}").toString
    case FCall(t, pos, kw) =>
      val args = pos.map(atomText) ++ kw.map { case (k, v) => s"$k='$v'" }
      s"{{ $t(${args.mkString(", ")}) }}"
  }.mkString

  private def macroSrcOf(macros: Seq[MacroG]): String =
    macros.map { m =>
      val sig = m.params.map(p =>
        m.defaults.get(p).map(d => s"$p='$d'").getOrElse(p)).mkString(", ")
      s"{% macro ${m.name}($sig) %}${textOf(m.body)}{% endmacro %}"
    }.mkString("\n-- between-macros filler\n")

  // --- model evaluator -----------------------------------------------------
  private def atomVal(a: Atom, env: Map[String, String]): Option[String] =
    a match {
      case ALit(v)     => Some(v)
      case ANum(v)     => Some(v)
      case AName(n)    => env.get(n)
      case AKw("none") => Some("")
      case AKw(k)      => Some(k)
    }

  private def truthy(s: String): Boolean =
    s.nonEmpty && !Set("false", "0", "none").contains(s.toLowerCase)

  private def condVal(c: Cond, env: Map[String, String]): Boolean = c match {
    case CTruth(a) => atomVal(a, env).exists(truthy)
    case CNot(a)   => !atomVal(a, env).exists(truthy)
    case CEq(l, r) => atomVal(l, env).orNull == atomVal(r, env).orNull
    case CNe(l, r) => atomVal(l, env).orNull != atomVal(r, env).orNull
    case CInList(l, items) => atomVal(l, env).exists(v =>
      // list items resolve like evalAtom's list branch: undefined name → ""
      items.map(i => atomVal(i, env).getOrElse("")).contains(v))
    case CInStr(l, s) => atomVal(l, env).exists(s.contains)
  }

  private def filtApply(v0: Option[String], fs: Filters): String = {
    var v = v0
    fs.foreach { case (f, args) =>
      f match {
        case "default" =>
          if (v.forall(_.isEmpty)) v = Some(args.headOption.getOrElse(""))
        case "upper"   => v = v.map(_.toUpperCase)
        case "lower"   => v = v.map(_.toLowerCase)
        case "trim"    => v = v.map(_.trim)
        case "length"  => v = v.map(_.length.toString)
        case "replace" => v = v.map(_.replace(args(0), args(1)))
        case other     => sys.error(s"model: unexpected filter $other")
      }
    }
    v.getOrElse(sys.error("model: undefined value reached a filter chain " +
      "without default — generator bug"))
  }

  /** Render the fragment list and thread the env exactly as the renderer
    * does: {% set %} binds for the rest of the block and leaks out of a
    * TAKEN {% if %} branch; a {% for %} body is a scope (per-iteration
    * bindings are discarded); macro bodies see ONLY their bound params.
    */
  private def eval(frags: Seq[Frag], env0: Map[String, String],
      macros: Map[String, MacroG]): (String, Map[String, String]) = {
    var env = env0
    val sb = new StringBuilder
    frags.foreach {
      case FText(s) => sb.append(s)
      case FVar(n)  => sb.append(env.getOrElse(n, ""))
      case FFilt(base, fs) =>
        sb.append(filtApply(base.fold(l => Some(l), n => env.get(n)), fs))
      case FSet(n, lit, fs) =>
        env += n -> filtApply(Some(lit), fs)
      case FSetBlock(n, body) =>
        // the block body is its own scope: render with the current env,
        // discard its set bindings, bind the rendered text
        env += n -> eval(body, env, macros)._1
      case FForRange(v, lo, hi, step, body) =>
        // independent model of minijinja's range: end-exclusive, signed step
        val vals = {
          val b = Seq.newBuilder[String]
          var i = lo
          while ((step > 0 && i < hi) || (step < 0 && i > hi)) {
            b += i.toString; i += step
          }
          b.result()
        }
        val n = vals.size
        vals.zipWithIndex.foreach { case (item, i) =>
          sb.append(eval(body, env ++ Map(
            v -> item,
            "loop.index" -> (i + 1).toString,
            "loop.index0" -> i.toString,
            "loop.revindex" -> (n - i).toString,
            "loop.revindex0" -> (n - i - 1).toString,
            "loop.first" -> (if (i == 0) "true" else "false"),
            "loop.last" -> (if (i == n - 1) "true" else "false"),
            "loop.length" -> n.toString), macros)._1)
        }
      case FFor(v, items, body) =>
        val vals = items.map(a => atomVal(a, env).getOrElse(""))
        val n = vals.size
        vals.zipWithIndex.foreach { case (item, i) =>
          sb.append(eval(body, env ++ Map(
            v -> item,
            "loop.index" -> (i + 1).toString,
            "loop.index0" -> i.toString,
            "loop.revindex" -> (n - i).toString,
            "loop.revindex0" -> (n - i - 1).toString,
            "loop.first" -> (if (i == 0) "true" else "false"),
            "loop.last" -> (if (i == n - 1) "true" else "false"),
            "loop.length" -> n.toString), macros)._1)
        }
      case FIf(branches) =>
        branches.collectFirst {
          case (cond, body) if cond.forall(condVal(_, env)) => body
        }.foreach { b =>
          val (out, envAfter) = eval(b, env, macros)
          sb.append(out)
          env = envAfter
        }
      case FCall(t, pos, kw) =>
        macros.get(t).foreach { m =>
          val bound = scala.collection.mutable.Map[String, String]() ++=
            m.defaults
          pos.zipWithIndex.foreach { case (a, i) =>
            // a name arg substitutes its in-scope value (subst runs before
            // expansion); an unbound name binds its own literal text
            val v = a match {
              case AName(n) => env.getOrElse(n, n)
              case ALit(s)  => s
              case ANum(s)  => s
              case AKw(k)   => k
            }
            if (i < m.params.length) bound(m.params(i)) = v
          }
          kw.foreach { case (k, v) => bound(k) = v }
          sb.append(eval(m.body, bound.toMap, macros)._1)
        }
    }
    (sb.toString, env)
  }

  // --- generators ----------------------------------------------------------
  private val word: Gen[String] = for {
    n  <- Gen.choose(1, 6)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val textFrag: Gen[Frag] = for {
    n  <- Gen.choose(1, 3)
    ws <- Gen.listOfN(n, word)
  } yield FText(ws.mkString(" "))

  private val loopVars = Seq("xa", "xb")
  private val setVars  = Seq("sa", "sb")

  /** scopeF: names guaranteed bound AND dot-free (safe as a filter base —
    * filteredVarPat rejects dotted names); scopeV: every in-scope name
    * incl. loop.* (safe in {{ }} slots, conditions, call args).
    */
  private final case class Ctx(scopeF: Set[String], scopeV: Set[String],
      macros: Seq[MacroG], depth: Int)

  private def itemAtomGen(ctx: Ctx): Gen[Atom] = Gen.frequency(
    4 -> word.map(ALit),
    2 -> Gen.oneOf("0", "1", "42", "-7").map(ANum),
    2 -> (if (ctx.scopeV.nonEmpty) Gen.oneOf(ctx.scopeV.toSeq).map(AName)
          else word.map(ALit)))

  private def atomGen(ctx: Ctx): Gen[Atom] = Gen.frequency(
    6 -> itemAtomGen(ctx),
    1 -> Gen.const(AName("zz")),
    1 -> Gen.oneOf("true", "false", "none").map(AKw))

  private def condGen(ctx: Ctx): Gen[Cond] = {
    val a = atomGen(ctx)
    Gen.frequency(
      3 -> a.map(CTruth),
      2 -> a.map(CNot),
      3 -> Gen.zip(a, a).map { case (l, r) => CEq(l, r) },
      2 -> Gen.zip(a, a).map { case (l, r) => CNe(l, r) },
      2 -> (for {
        l  <- a
        n  <- Gen.choose(1, 3)
        is <- Gen.listOfN(n, itemAtomGen(ctx))
      } yield CInList(l, is)),
      1 -> Gen.zip(a, word).map { case (l, s) => CInStr(l, s) })
  }

  private val oneFilter: Gen[(String, Seq[String])] = Gen.frequency(
    4 -> Gen.oneOf("upper", "lower", "trim", "length").map(f => (f, Nil)),
    2 -> Gen.zip(word, word).map { case (a, b) => ("replace", Seq(a, b)) },
    2 -> word.map(v => ("default", Seq(v))))

  private def filtersGen(needDefaultFirst: Boolean): Gen[Filters] = for {
    n  <- Gen.choose(if (needDefaultFirst) 0 else 1, 2)
    fs <- Gen.listOfN(n, oneFilter)
    d  <- word
  } yield if (needDefaultFirst) ("default", Seq(d)) +: fs else fs

  private def filtFrag(ctx: Ctx): Gen[Frag] = Gen.frequency(
    3 -> (for { l <- word; fs <- filtersGen(false) } yield FFilt(Left(l), fs)),
    2 -> (if (ctx.scopeF.nonEmpty)
            for {
              n  <- Gen.oneOf(ctx.scopeF.toSeq)
              fs <- filtersGen(false)
            } yield FFilt(Right(n), fs)
          else
            for { l <- word; fs <- filtersGen(false) } yield FFilt(Left(l), fs)),
    // undefined base: legal only because default() comes first
    1 -> filtersGen(true).map(fs => FFilt(Right("zz"), fs)))

  private def setFrag: Gen[Frag] = for {
    nm   <- Gen.oneOf(setVars)
    l    <- word
    useF <- Gen.oneOf(true, false)
    fs   <- if (useF) filtersGen(false) else Gen.const(Seq.empty[(String, Seq[String])])
  } yield FSet(nm, l, fs)

  private def callFrag(ctx: Ctx): Gen[Frag] = for {
    m     <- Gen.oneOf(ctx.macros)
    real  <- Gen.frequency(9 -> Gen.const(true), 1 -> Gen.const(false))
    npos  <- Gen.choose(0, m.params.length)
    pos   <- Gen.listOfN(npos, itemAtomGen(ctx))
    kwSel <- Gen.someOf(m.params.drop(npos))
    kwVal <- Gen.listOfN(kwSel.size, word)
  } yield FCall(if (real) m.name else "zz",
    pos, kwSel.toSeq.zip(kwVal))

  private def forFrag(ctx: Ctx, allowCalls: Boolean): Gen[Frag] = for {
    v     <- Gen.oneOf(loopVars)
    ni    <- Gen.choose(1, 3)
    items <- Gen.listOfN(ni, itemAtomGen(ctx))
    nb    <- Gen.choose(1, 3)
    body  <- fragsGen(nb, ctx.copy(
      scopeF = ctx.scopeF + v,
      scopeV = ctx.scopeV + v + "loop.index" + "loop.index0" +
        "loop.revindex" + "loop.revindex0" +
        "loop.first" + "loop.last" + "loop.length",
      depth = ctx.depth - 1), allowCalls)
  } yield FFor(v, items, body)

  private def ifFrag(ctx: Ctx, allowCalls: Boolean): Gen[Frag] = {
    val inner = ctx.copy(depth = ctx.depth - 1)
    for {
      c1      <- condGen(ctx)
      n1      <- Gen.choose(0, 2)
      b1      <- fragsGen(n1, inner, allowCalls)
      hasElif <- Gen.oneOf(true, false)
      cElif   <- condGen(ctx)
      bElif   <- fragsGen(1, inner, allowCalls)
      hasElse <- Gen.oneOf(true, false)
      bElse   <- fragsGen(1, inner, allowCalls)
    } yield FIf(
      Seq(Some(c1) -> b1) ++
        (if (hasElif) Seq(Some(cElif) -> bElif) else Nil) ++
        (if (hasElse) Seq(Option.empty[Cond] -> bElse) else Nil))
  }

  private def setBlockFrag(ctx: Ctx): Gen[Frag] = for {
    nm   <- Gen.oneOf(setVars)
    nb   <- Gen.choose(1, 2)
    w    <- word
    // call-free body: a call bound into the block value expands later and
    // equivalently, but keeping blocks call-free keeps the model 1:1.
    // The leading word keeps the bound value nonempty — an empty string
    // later passed as a call arg would vanish in splitArgs and shift the
    // positional binding (a set-var value can reach arg position via the
    // shared name pool).
    body <- fragsGen(nb, ctx.copy(depth = ctx.depth - 1), allowCalls = false)
  } yield FSetBlock(nm, FText(w) :: body)

  private def forRangeFrag(ctx: Ctx, allowCalls: Boolean): Gen[Frag] = for {
    v    <- Gen.oneOf(loopVars)
    lo   <- Gen.choose(-3L, 3L)
    hi   <- Gen.choose(-3L, 6L)
    step <- Gen.oneOf(-2L, -1L, 1L, 2L)
    nb   <- Gen.choose(1, 2)
    body <- fragsGen(nb, ctx.copy(
      scopeF = ctx.scopeF + v,
      scopeV = ctx.scopeV + v + "loop.index" + "loop.index0" +
        "loop.revindex" + "loop.revindex0" +
        "loop.first" + "loop.last" + "loop.length",
      depth = ctx.depth - 1), allowCalls)
  } yield FForRange(v, lo, hi, step, body)

  private def fragGen(ctx: Ctx, allowCalls: Boolean): Gen[Frag] = {
    val base = Seq(
      4 -> textFrag,
      2 -> Gen.oneOf((ctx.scopeV + "zz").toSeq).map(FVar(_): Frag),
      2 -> filtFrag(ctx),
      2 -> setFrag)
    val calls =
      if (allowCalls && ctx.macros.nonEmpty) Seq(2 -> callFrag(ctx)) else Nil
    val rec =
      if (ctx.depth > 0)
        Seq(2 -> forFrag(ctx, allowCalls), 2 -> ifFrag(ctx, allowCalls),
          1 -> setBlockFrag(ctx), 1 -> forRangeFrag(ctx, allowCalls))
      else Nil
    Gen.frequency((base ++ calls ++ rec): _*)
  }

  private def fragsGen(n: Int, ctx: Ctx, allowCalls: Boolean): Gen[List[Frag]] =
    if (n <= 0) Gen.const(Nil)
    else fragGen(ctx, allowCalls).flatMap { f =>
      val ctx2 = f match {
        case FSet(nm, _, _) =>
          ctx.copy(scopeF = ctx.scopeF + nm, scopeV = ctx.scopeV + nm)
        case FSetBlock(nm, _) =>
          ctx.copy(scopeF = ctx.scopeF + nm, scopeV = ctx.scopeV + nm)
        case _ => ctx
      }
      fragsGen(n - 1, ctx2, allowCalls).map(f :: _)
    }

  /** Params get per-macro-unique names so a keyword-arg key can never
    * collide with a name bound in the calling scope (substParams rewrites
    * any bound word in the arg text, keys included).
    */
  private def macroGen(prefix: String,
      callable: Seq[MacroG]): Gen[MacroG] = for {
    np <- Gen.choose(0, 2)
    params = (0 until np).map(i => s"$prefix${('a' + i).toChar}")
    nd <- Gen.choose(0, np)
    dv <- Gen.listOfN(nd, word)
    nb <- Gen.choose(0, 3)
    defaults = params.takeRight(nd).zip(dv).toMap
    body <- fragsGen(nb,
      Ctx(defaults.keySet, params.toSet, callable, depth = 1),
      allowCalls = callable.nonEmpty)
  } yield MacroG(s"m$prefix", params, defaults, body)

  private val macrosGen: Gen[List[MacroG]] = for {
    ma     <- macroGen("pa", Nil) // leaf
    wantMb <- Gen.oneOf(true, false)
    mb     <- macroGen("pb", Seq(ma)) // may call ma
  } yield if (wantMb) List(ma, mb) else List(ma)

  private val caseGen: Gen[(String, String, String)] = for {
    macros <- macrosGen
    nf     <- Gen.choose(1, 5)
    frags  <- fragsGen(nf,
      Ctx(Set.empty, Set.empty, macros, depth = 2), allowCalls = true)
  } yield {
    val byName = macros.map(m => m.name -> m).toMap
    (macroSrcOf(macros), textOf(frags),
      eval(frags, Map.empty, byName)._1.trim)
  }

  // --- properties ----------------------------------------------------------
  property("render matches the jinja model") = Prop.forAll(caseGen) {
    case (macroSrc, template, expected) =>
      val got = MacroRenderer.render(template, macroSrc)
      (got == expected) :|
        s"template=<$template>\nmacros=<$macroSrc>\n" +
        s"got=<$got>\nexpected=<$expected>"
  }

  property("rendered output is a fixpoint (no jinja remnants)") =
    Prop.forAll(caseGen) { case (macroSrc, template, _) =>
      val out = MacroRenderer.render(template, macroSrc)
      val again = MacroRenderer.render(out, macroSrc)
      (again == out) :| s"out=<$out>\nagain=<$again>"
    }

  property("parseMacros round-trips generated definitions") =
    Prop.forAllNoShrink(macrosGen) { macros =>
      val parsed = MacroRenderer.parseMacros(macroSrcOf(macros))
      (parsed.keySet == macros.map(_.name).toSet) &&
        macros.forall { m =>
          parsed(m.name).params == m.params &&
            parsed(m.name).defaults == m.defaults
        }
    }
}
