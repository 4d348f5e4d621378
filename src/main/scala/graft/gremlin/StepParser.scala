package graft.gremlin

/**
 * Recursive-descent parser for the reference's Gremlin subset
 * (tokenizer semantics of Grasper `core/parser.cpp:442-493` `GetSteps`,
 * step dispatch `core/parser.cpp:534-613`, predicate parse
 * `core/parser.cpp:660-717,1541-1553`).
 *
 * Grammar:
 * {{{
 *   query   := "g" "." step ("." step)*
 *   step    := NAME "(" args? ")"
 *   args    := arg ("," arg)*
 *   arg     := STRING | NUMBER | IDENT | pred | sub
 *   pred    := PREDNAME "(" args ")"          // eq, gt, within, …
 *   sub     := ["__."] step ("." step)*       // union/and/or/not/where/repeat
 * }}}
 */
object StepParser {

  final case class ParseException(msg: String) extends Exception(msg)

  // ---------------- tokenizer ----------------
  sealed trait Tok
  final case class TName(s: String)  extends Tok
  final case class TStr(s: String)   extends Tok
  final case class TNum(s: String)   extends Tok
  case object TLParen extends Tok
  case object TRParen extends Tok
  case object TComma  extends Tok
  case object TDot    extends Tok

  def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == '.') {
        // dot inside a number is handled in the number branch
        out += TDot; i += 1
      }
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != quote) {
          if (q(i) == '\\' && i + 1 < n) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        if (i >= n) throw ParseException(s"unterminated string in: $q")
        i += 1
        out += TStr(sb.toString)
      }
      else if (c.isDigit || (c == '-' && i + 1 < n && q(i + 1).isDigit)) {
        val sb = new StringBuilder
        if (c == '-') { sb += c; i += 1 }
        while (i < n && (q(i).isDigit || q(i) == '.')) { sb += q(i); i += 1 }
        // scientific notation
        if (i < n && (q(i) == 'e' || q(i) == 'E')) {
          sb += q(i); i += 1
          if (i < n && (q(i) == '+' || q(i) == '-')) { sb += q(i); i += 1 }
          while (i < n && q(i).isDigit) { sb += q(i); i += 1 }
        }
        out += TNum(sb.toString)
      }
      else if (c.isLetter || c == '_') {
        val sb = new StringBuilder
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) {
          sb += q(i); i += 1
        }
        out += TName(sb.toString)
      }
      else throw ParseException(s"unexpected char '$c' at $i in: $q")
    }
    out.result()
  }

  // ---------------- parser ----------------
  private val predNames = Set(
    "eq", "neq", "lt", "lte", "gt", "gte", "inside", "outside", "between",
    "within", "without")
  private val stepNames = Set(
    "V", "E", "has", "hasNot", "hasKey", "hasValue", "hasLabel", "is",
    "where", "out", "in", "both", "outE", "inE", "bothE", "outV", "inV",
    "bothV", "values", "properties", "key", "label", "as", "select",
    "count", "sum", "max", "min", "mean", "dedup", "order", "limit",
    "range", "skip", "group", "groupCount", "aggregate", "cap", "union",
    "and", "or", "not", "repeat", "times", "until", "emit", "coin",
    "path")

  /** An argument inside a step's parens. */
  sealed trait Arg
  final case class AStr(s: String)          extends Arg
  final case class ANum(l: Lit)             extends Arg
  final case class AIdent(s: String)        extends Arg  // incr, decr, V, E…
  final case class APred(name: String, args: Seq[Arg]) extends Arg
  final case class ASub(steps: List[Step])  extends Arg

  private final class Cursor(val toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = peekAt(pos)
    def peekAt(i: Int): Option[Tok] =
      if (i < toks.length) Some(toks(i)) else None
    def next(): Tok = {
      if (pos >= toks.length) throw ParseException("unexpected end of query")
      val t = toks(pos); pos += 1; t
    }
    def expect(t: Tok): Unit = {
      val got = next()
      if (got != t) throw ParseException(s"expected $t, got $got")
    }
  }

  /** Parse a full query string: `g.V().…`. */
  def parse(query: String): List[Step] = {
    val cur = new Cursor(tokenize(query))
    cur.next() match {
      case TName("g") => ()
      case t => throw ParseException(s"query must start with g., got $t")
    }
    cur.expect(TDot)
    val steps = parseChain(cur)
    if (cur.pos != cur.peek.fold(cur.pos)(_ => cur.pos))
      () // no-op; chain consumes to the end
    if (cur.peek.isDefined)
      throw ParseException(s"trailing tokens after query: ${cur.peek.get}")
    steps
  }

  /** Parse `step ("." step)*` until the cursor hits a non-chain token.
    * `repeat(sub).times(k)` folds into the preceding Repeat — an
    * extension beyond the reference, whose repeat is single-pass. */
  private def parseChain(cur: Cursor): List[Step] = {
    var steps = List.empty[Step]
    def isPreMarker(s: Step): Boolean = s match {
      case Step.UntilMarker(_) | Step.EmitMarker => true
      case _                                     => false
    }
    def push(s: Step): Unit = (s, steps) match {
      case (Step.TimesMarker(k), (r: Step.Repeat) :: rest) =>
        steps = r.copy(times = Some(k)) :: rest
      case (Step.TimesMarker(_), _) =>
        throw ParseException("times() must follow repeat()")
      case (Step.UntilMarker(c), (r: Step.Repeat) :: rest) =>
        if (r.until.isDefined)
          throw ParseException("duplicate until() on one repeat()")
        steps = r.copy(until = Some(c)) :: rest
      case (Step.EmitMarker, (r: Step.Repeat) :: rest) =>
        steps = r.copy(emit = true) :: rest
      // pre-position markers (TinkerPop while-do / depth-0 emission):
      // until()/emit() with no preceding repeat() sit on the stack and
      // fold into the NEXT step iff it is a repeat()
      case (Step.UntilMarker(_) | Step.EmitMarker, _) =>
        steps = s :: steps
      case (r0: Step.Repeat, _) if steps.headOption.exists(isPreMarker) =>
        var r = r0
        while (steps.headOption.exists(isPreMarker)) {
          steps.head match {
            case Step.UntilMarker(c) =>
              if (r.until.isDefined)
                throw ParseException("duplicate until() on one repeat()")
              r = r.copy(until = Some(c), untilPre = true)
            case _ => r = r.copy(emitPre = true)
          }
          steps = steps.tail
        }
        steps = r :: steps
      case _ =>
        if (steps.headOption.exists(isPreMarker))
          throw ParseException(
            "until()/emit() must follow or immediately precede repeat()")
        steps = s :: steps
    }
    push(parseStep(cur))
    var continue = true
    while (continue) cur.peek match {
      case Some(TDot) => cur.next(); push(parseStep(cur))
      case _          => continue = false
    }
    if (steps.headOption.exists(isPreMarker))
      throw ParseException(
        "until()/emit() must follow or immediately precede repeat()")
    steps.reverse
  }

  private def parseStep(cur: Cursor): Step = {
    val name = cur.next() match {
      case TName(s) => s
      case t        => throw ParseException(s"expected step name, got $t")
    }
    if (!stepNames.contains(name))
      throw ParseException(s"unknown step: $name")
    cur.expect(TLParen)
    val args = parseArgs(cur)
    cur.expect(TRParen)
    buildStep(name, args)
  }

  private def parseArgs(cur: Cursor): Seq[Arg] = {
    val args = Seq.newBuilder[Arg]
    if (cur.peek.contains(TRParen)) return Seq.empty
    var continue = true
    while (continue) {
      args += parseArg(cur)
      cur.peek match {
        case Some(TComma) => cur.next()
        case _            => continue = false
      }
    }
    args.result()
  }

  private def parseArg(cur: Cursor): Arg = cur.peek match {
    case Some(TStr(s)) => cur.next(); AStr(s)
    case Some(TNum(s)) =>
      cur.next()
      if (s.contains('.') || s.contains('e') || s.contains('E'))
        ANum(Lit.D(s.toDouble))
      else ANum(Lit.I(s.toLong))
    case Some(TName("__")) =>
      // anonymous traversal prefix: __.out(...)
      cur.next(); cur.expect(TDot)
      ASub(parseChain(cur))
    case Some(TName(n)) if predNames.contains(n) =>
      cur.next()
      cur.expect(TLParen)
      val inner = parseArgs(cur)
      cur.expect(TRParen)
      APred(n, inner)
    case Some(TName(n)) if stepNames.contains(n) &&
        cur.peekAt(cur.pos + 1).contains(TLParen) =>
      ASub(parseChain(cur))
    case Some(TName(n)) => cur.next(); AIdent(n)
    case t => throw ParseException(s"unexpected token in args: $t")
  }

  // ---------------- step construction ----------------
  private def litOf(a: Arg): Lit = a match {
    case ANum(l)   => l
    case AStr(s)   => Lit.S(s)
    case AIdent(s) => Lit.S(s) // bare identifier = unquoted string value
    case other     => throw ParseException(s"expected literal, got $other")
  }

  private def strOf(a: Arg): String = a match {
    case AStr(s)   => s
    case AIdent(s) => s
    case other     => throw ParseException(s"expected string, got $other")
  }

  private def predOf(name: String, args: Seq[Arg]): Pred = name match {
    case "eq"      => Pred.Eq(litOf(args.head))
    case "neq"     => Pred.Neq(litOf(args.head))
    case "lt"      => Pred.Lt(litOf(args.head))
    case "lte"     => Pred.Lte(litOf(args.head))
    case "gt"      => Pred.Gt(litOf(args.head))
    case "gte"     => Pred.Gte(litOf(args.head))
    case "inside"  => Pred.Inside(litOf(args(0)), litOf(args(1)))
    case "outside" => Pred.Outside(litOf(args(0)), litOf(args(1)))
    case "between" => Pred.Between(litOf(args(0)), litOf(args(1)))
    case "within"  => Pred.Within(args.map(litOf))
    case "without" => Pred.Without(args.map(litOf))
    case other     => throw ParseException(s"unknown predicate: $other")
  }

  private def subOf(a: Arg): List[Step] = a match {
    case ASub(steps) => steps
    case other => throw ParseException(s"expected sub-traversal, got $other")
  }

  private def buildStep(name: String, args: Seq[Arg]): Step = {
    import Step._
    name match {
      case "V" => V(args.map { case ANum(Lit.I(v)) => v
        case a => throw ParseException(s"V() takes ids, got $a") })
      case "E" => E()

      case "has" => args match {
        case Seq(k)                    => Has(strOf(k), Pred.Any)
        case Seq(k, APred(pn, pargs))  => Has(strOf(k), predOf(pn, pargs))
        case Seq(k, v)                 => Has(strOf(k), Pred.Eq(litOf(v)))
        case other => throw ParseException(s"bad has args: $other")
      }
      case "hasNot"   => Has(strOf(args.head), Pred.None)
      case "hasKey"   => HasKey(args.map(strOf))
      case "hasValue" => HasValue(args.map(litOf))
      case "hasLabel" => HasLabel(args.map(strOf))
      case "is" => args.head match {
        case APred(pn, pargs) => Is(predOf(pn, pargs))
        case v                => Is(Pred.Eq(litOf(v)))
      }
      case "coin" => args.head match {
        case ANum(Lit.D(p)) => Coin(p)
        case ANum(Lit.I(p)) => Coin(p.toDouble)
        case a => throw ParseException(s"bad coin arg: $a")
      }

      case "where" => args match {
        // where(within("x")/without("x")) — aggregate side-effect check
        case Seq(APred("within", ps))  => WhereStore(strOf(ps.head), anti = false)
        case Seq(APred("without", ps)) => WhereStore(strOf(ps.head), anti = true)
        // where(neq("a")) — current vs history
        case Seq(APred(op, ps)) => WherePred(op, strOf(ps.head))
        // where("a", neq("b")) — history vs history
        case Seq(AStr(l), APred(op, ps)) => WhereHistory(l, op, strOf(ps.head))
        // where(subquery) — "re-sugar to and()" (parser.cpp:1464-1474)
        case Seq(s @ ASub(_)) => BranchFilter(AndOp, Seq(subOf(s)))
        case other => throw ParseException(s"bad where args: $other")
      }

      case "out"   => VtoV(Out, args.map(strOf))
      case "in"    => VtoV(In, args.map(strOf))
      case "both"  => VtoV(Both, args.map(strOf))
      case "outE"  => VtoE(Out, args.map(strOf))
      case "inE"   => VtoE(In, args.map(strOf))
      case "bothE" => VtoE(Both, args.map(strOf))
      case "outV"  => EtoV(Out)
      case "inV"   => EtoV(In)
      case "bothV" => EtoV(Both)

      case "values"     => Values(args.map(strOf))
      case "properties" => Properties(args.map(strOf))
      case "key"        => Key()
      case "label"      => Label()
      case "as"         => As(strOf(args.head))
      case "select"     => Select(args.map(strOf))

      case "count" => Count()
      case "sum"   => MathStep(SumOp)
      case "max"   => MathStep(MaxOp)
      case "min"   => MathStep(MinOp)
      case "mean"  => MathStep(MeanOp)
      case "dedup" => Dedup(args.map(strOf))
      case "order" => args match {
        case Seq() => Order(None, desc = false)
        case Seq(AIdent(d)) => Order(None, descOf(d))
        case Seq(k, AIdent(d)) => Order(Some(strOf(k)), descOf(d))
        case Seq(k) => Order(Some(strOf(k)), desc = false)
        case other => throw ParseException(s"bad order args: $other")
      }
      case "limit" => Range(0, numOf(args.head))
      case "skip"  => Range(numOf(args.head), -1)
      case "range" => Range(numOf(args(0)), numOf(args(1)))
      case "group" => args match {
        case Seq()     => Group(None, None, countOnly = false)
        case Seq(k)    => Group(Some(strOf(k)), None, countOnly = false)
        case Seq(k, v) => Group(Some(strOf(k)), Some(strOf(v)), countOnly = false)
        case other => throw ParseException(s"bad group args: $other")
      }
      case "groupCount" => args match {
        case Seq()  => Group(None, None, countOnly = true)
        case Seq(k) => Group(Some(strOf(k)), None, countOnly = true)
        case other => throw ParseException(s"bad groupCount args: $other")
      }
      case "aggregate" => Aggregate(strOf(args.head))
      case "cap"       => Cap(args.map(strOf))

      case "times"  => TimesMarker(numOf(args.head).toInt) // folded by parseChain
      case "until"  => UntilMarker(subOf(args.head))       // folded by parseChain
      case "emit" if args.isEmpty => EmitMarker            // folded by parseChain
      case "union"  => Union(args.map(subOf))
      case "and"    => BranchFilter(AndOp, args.map(subOf))
      case "or"     => BranchFilter(OrOp, args.map(subOf))
      case "not"    => BranchFilter(NotOp, args.map(subOf))
      case "repeat" => Repeat(subOf(args.head))
      case "path" if args.isEmpty => PathStep()

      case other => throw ParseException(s"unhandled step: $other")
    }
  }

  private def descOf(d: String): Boolean = d match {
    case "decr" | "desc" => true
    case "incr" | "asc"  => false
    case other => throw ParseException(s"bad order direction: $other")
  }

  private def numOf(a: Arg): Long = a match {
    case ANum(Lit.I(v)) => v
    case other => throw ParseException(s"expected integer, got $other")
  }
}
