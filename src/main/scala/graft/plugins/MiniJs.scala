package graft.plugins

import scala.collection.mutable

/** A small, dependency-free JavaScript (ES5-subset) interpreter
  * powering script functions (reference internal/plugin/js — goja
  * behind `/udf/javascript`; the JVM ships no JS engine since
  * Nashorn's removal, so graft interprets the subset script UDFs
  * actually use).
  *
  * Supported: function declarations/expressions + closures, var/let/
  * const, if/else, while, do/while, for(;;), for..of, return/break/
  * continue, numbers (all Double, like JS), strings, booleans, null/
  * undefined, arrays, object literals, full expression grammar
  * (+ - * / %, comparisons, ==/=== coercion rules, && || !, ?:,
  * assignment incl. compound and ++/--, member/index access, calls),
  * and the library surface scripts lean on: Math.*, JSON.parse/
  * stringify, String/Array methods (length, slice, indexOf, split,
  * join, map, filter, reduce, push, ...), parseInt/parseFloat/isNaN,
  * String()/Number()/Boolean(), typeof, and the reference's log().
  *
  * Deliberately NOT supported (throw at parse/run time): prototypes,
  * `new`, `this`, regex literals, getters/setters, generators, async.
  *
  * Every call runs under a step budget (default 2M ops) so a
  * misbehaving script cannot wedge an executor core — a runaway loop
  * raises instead of spinning.
  */
object MiniJs {

  // ---------- values ----------
  case object JsUndefined { override def toString = "undefined" }
  case object JsNull { override def toString = "null" }
  final class JsArr(val items: mutable.ArrayBuffer[Any]) {
    override def toString: String = stringify(this)
  }
  final class JsObj(val fields: mutable.LinkedHashMap[String, Any]) {
    override def toString: String = stringify(this)
  }
  trait Callable { def call(args: Seq[Any]): Any }

  /** A callable global that also carries static members — the shape
    * of JS's String/Number/Object/Array built-ins (callable as a
    * conversion, dotted for statics like String.fromCharCode).
    */
  final class NativeObj(callFn: Seq[Any] => Any,
                        val statics: Map[String, Any]) extends Callable {
    def call(args: Seq[Any]): Any = callFn(args)
  }

  // ---------- lexer ----------
  private sealed trait Tok
  private case class TNum(v: Double) extends Tok
  private case class TStr(v: String) extends Tok
  private case class TId(v: String) extends Tok
  private case class TPunct(v: String) extends Tok
  private case object TEof extends Tok

  private val punct3 = Seq("===", "!==", ">>>")
  private val punct2 = Seq("==", "!=", "<=", ">=", "&&", "||", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "=>")

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src(i) == '*' && src(i + 1) == '/')) i += 1
        i += 2
      } else if (c.isDigit || (c == '.' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        if (c == '0' && i + 1 < n && (src(i + 1) == 'x' || src(i + 1) == 'X')) {
          i += 2
          while (i < n && (src(i).isDigit || "abcdefABCDEF".contains(src(i)))) i += 1
          out += TNum(java.lang.Long.parseLong(src.substring(start + 2, i), 16).toDouble)
        } else {
          while (i < n && src(i).isDigit) i += 1
          if (i < n && src(i) == '.') { i += 1; while (i < n && src(i).isDigit) i += 1 }
          if (i < n && (src(i) == 'e' || src(i) == 'E')) {
            i += 1
            if (i < n && (src(i) == '+' || src(i) == '-')) i += 1
            while (i < n && src(i).isDigit) i += 1
          }
          out += TNum(src.substring(start, i).toDouble)
        }
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) {
            src(i + 1) match {
              case 'n' => sb += '\n'
              case 't' => sb += '\t'
              case 'r' => sb += '\r'
              case 'b' => sb += '\b'
              case 'f' => sb += '\f'
              case '0' => sb += 0.toChar
              case 'u' if i + 5 < n =>
                sb += Integer.parseInt(src.substring(i + 2, i + 6), 16).toChar
                i += 4
              case other => sb += other
            }
            i += 2
          } else { sb += src(i); i += 1 }
        }
        require(i < n, "unterminated string literal")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '$')) i += 1
        out += TId(src.substring(start, i))
      } else {
        val rest3 = if (i + 3 <= n) src.substring(i, i + 3) else ""
        val rest2 = if (i + 2 <= n) src.substring(i, i + 2) else ""
        if (punct3.contains(rest3)) { out += TPunct(rest3); i += 3 }
        else if (punct2.contains(rest2)) { out += TPunct(rest2); i += 2 }
        else { out += TPunct(c.toString); i += 1 }
      }
    }
    out += TEof
    out.result()
  }

  // ---------- AST ----------
  private sealed trait Node
  private case class Num(v: Double) extends Node
  private case class Str(v: String) extends Node
  private case class Id(name: String) extends Node
  private case class Bool(v: Boolean) extends Node
  private case object NullLit extends Node
  private case object UndefLit extends Node
  private case class ArrLit(items: Seq[Node]) extends Node
  private case class ObjLit(entries: Seq[(String, Node)]) extends Node
  private case class FuncLit(name: Option[String], params: Seq[String],
                             body: Seq[Node]) extends Node
  private case class Unary(op: String, e: Node) extends Node
  private case class Update(op: String, target: Node, prefix: Boolean) extends Node
  private case class Binary(op: String, l: Node, r: Node) extends Node
  private case class Logical(op: String, l: Node, r: Node) extends Node
  private case class Cond(c: Node, t: Node, f: Node) extends Node
  private case class Assign(op: String, target: Node, value: Node) extends Node
  private case class Member(obj: Node, name: String) extends Node
  private case class IndexN(obj: Node, idx: Node) extends Node
  private case class Call(callee: Node, args: Seq[Node]) extends Node
  // statements
  private case class VarDecl(names: Seq[(String, Option[Node])]) extends Node
  private case class If(c: Node, t: Node, f: Option[Node]) extends Node
  private case class While(c: Node, body: Node, doWhile: Boolean) extends Node
  private case class For(init: Option[Node], cond: Option[Node],
                         post: Option[Node], body: Node) extends Node
  private case class ForOf(varName: String, seq: Node, body: Node) extends Node
  private case class Return(e: Option[Node]) extends Node
  private case object BreakStmt extends Node
  private case object ContinueStmt extends Node
  private case class Block(stmts: Seq[Node]) extends Node
  private case class Throw(e: Node) extends Node

  // ---------- parser ----------
  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def isP(s: String): Boolean = peek == TPunct(s)
    private def isK(s: String): Boolean = peek == TId(s)
    private def eat(s: String): Unit = {
      val t = next()
      require(t == TPunct(s) || t == TId(s), s"expected '$s' but found $t")
    }
    private def ident(): String = next() match {
      case TId(v) => v
      case t => throw new IllegalArgumentException(s"expected identifier, found $t")
    }

    def program(): Seq[Node] = {
      val stmts = mutable.ArrayBuffer[Node]()
      while (peek != TEof) stmts += statement()
      stmts.toSeq
    }

    private def statement(): Node = peek match {
      case TId("function") =>
        next()
        val name = ident()
        FuncLit(Some(name), params(), funcBody())
      case TId("var") | TId("let") | TId("const") =>
        next()
        val decls = mutable.ArrayBuffer[(String, Option[Node])]()
        var more = true
        while (more) {
          val n = ident()
          val init = if (isP("=")) { next(); Some(expr()) } else None
          decls += (n -> init)
          if (isP(",")) next() else more = false
        }
        semi()
        VarDecl(decls.toSeq)
      case TId("if") =>
        next(); eat("(")
        val c = expr()
        eat(")")
        val t = statement()
        val f = if (isK("else")) { next(); Some(statement()) } else None
        If(c, t, f)
      case TId("while") =>
        next(); eat("(")
        val c = expr()
        eat(")")
        While(c, statement(), doWhile = false)
      case TId("do") =>
        next()
        val body = statement()
        eat("while"); eat("(")
        val c = expr()
        eat(")"); semi()
        While(c, body, doWhile = true)
      case TId("for") =>
        next(); eat("(")
        // for (x of xs) / for (var x of xs)
        val save = pos
        val isOf =
          try {
            if (isK("var") || isK("let") || isK("const")) next()
            val _ = ident()
            isK("of")
          } catch { case _: Exception => false } finally ()
        pos = save
        if (isOf) {
          if (isK("var") || isK("let") || isK("const")) next()
          val v = ident()
          eat("of")
          val seq = expr()
          eat(")")
          ForOf(v, seq, statement())
        } else {
          val init = if (isP(";")) None else Some(peek match {
            case TId("var") | TId("let") | TId("const") => statement() match {
              case v: VarDecl => v
              case other => other
            }
            case _ => val e = expr(); semi(); e
          })
          init match {
            case Some(_: VarDecl) => () // statement() consumed the ';'
            case Some(_) => ()
            case None => eat(";")
          }
          val cond = if (isP(";")) None else Some(expr())
          eat(";")
          val post = if (isP(")")) None else Some(expr())
          eat(")")
          For(init, cond, post, statement())
        }
      case TId("return") =>
        next()
        val e = if (isP(";") || isP("}") || peek == TEof) None else Some(expr())
        semi()
        Return(e)
      case TId("break") => next(); semi(); BreakStmt
      case TId("continue") => next(); semi(); ContinueStmt
      case TId("throw") => next(); val e = expr(); semi(); Throw(e)
      case TPunct("{") =>
        next()
        val stmts = mutable.ArrayBuffer[Node]()
        while (!isP("}")) stmts += statement()
        eat("}")
        Block(stmts.toSeq)
      case TPunct(";") => next(); Block(Nil)
      case _ => val e = expr(); semi(); e
    }

    private def semi(): Unit = if (isP(";")) next()

    private def params(): Seq[String] = {
      eat("(")
      val ps = mutable.ArrayBuffer[String]()
      while (!isP(")")) {
        ps += ident()
        if (isP(",")) next()
      }
      eat(")")
      ps.toSeq
    }

    private def funcBody(): Seq[Node] = {
      eat("{")
      val stmts = mutable.ArrayBuffer[Node]()
      while (!isP("}")) stmts += statement()
      eat("}")
      stmts.toSeq
    }

    def expr(): Node = assignment()

    private def assignment(): Node = {
      val left = conditional()
      peek match {
        case TPunct(op @ ("=" | "+=" | "-=" | "*=" | "/=" | "%=")) =>
          left match {
            case _: Id | _: Member | _: IndexN =>
              next()
              Assign(op, left, assignment())
            case _ => left
          }
        case _ => left
      }
    }

    private def conditional(): Node = {
      val c = logicalOr()
      if (isP("?")) {
        next()
        val t = assignment()
        eat(":")
        Cond(c, t, assignment())
      } else c
    }

    private def logicalOr(): Node = {
      var l = logicalAnd()
      while (isP("||")) { next(); l = Logical("||", l, logicalAnd()) }
      l
    }
    private def logicalAnd(): Node = {
      var l = equality()
      while (isP("&&")) { next(); l = Logical("&&", l, equality()) }
      l
    }
    private def equality(): Node = {
      var l = relational()
      while (isP("==") || isP("!=") || isP("===") || isP("!==")) {
        val TPunct(op) = next(): @unchecked
        l = Binary(op, l, relational())
      }
      l
    }
    private def relational(): Node = {
      var l = additive()
      while (isP("<") || isP(">") || isP("<=") || isP(">=")) {
        val TPunct(op) = next(): @unchecked
        l = Binary(op, l, additive())
      }
      l
    }
    private def additive(): Node = {
      var l = multiplicative()
      while (isP("+") || isP("-")) {
        val TPunct(op) = next(): @unchecked
        l = Binary(op, l, multiplicative())
      }
      l
    }
    private def multiplicative(): Node = {
      var l = unary()
      while (isP("*") || isP("/") || isP("%")) {
        val TPunct(op) = next(): @unchecked
        l = Binary(op, l, unary())
      }
      l
    }
    private def unary(): Node = peek match {
      case TPunct("!") => next(); Unary("!", unary())
      case TPunct("-") => next(); Unary("-", unary())
      case TPunct("+") => next(); Unary("+", unary())
      case TPunct("++") => next(); Update("++", unary(), prefix = true)
      case TPunct("--") => next(); Update("--", unary(), prefix = true)
      case TId("typeof") => next(); Unary("typeof", unary())
      case _ => postfix()
    }

    private def postfix(): Node = {
      var e = primary()
      var going = true
      while (going) peek match {
        case TPunct(".") => next(); e = Member(e, ident())
        case TPunct("[") => next(); val i = expr(); eat("]"); e = IndexN(e, i)
        case TPunct("(") =>
          next()
          val args = mutable.ArrayBuffer[Node]()
          while (!isP(")")) {
            args += assignment()
            if (isP(",")) next()
          }
          eat(")")
          e = Call(e, args.toSeq)
        case TPunct("++") => next(); e = Update("++", e, prefix = false)
        case TPunct("--") => next(); e = Update("--", e, prefix = false)
        case _ => going = false
      }
      e
    }

    private def primary(): Node = next() match {
      case TNum(v) => Num(v)
      case TStr(v) => Str(v)
      case TId("true") => Bool(true)
      case TId("false") => Bool(false)
      case TId("null") => NullLit
      case TId("undefined") => UndefLit
      case TId("function") =>
        val name = peek match { case TId(n) => next(); Some(n); case _ => None }
        FuncLit(name, params(), funcBody())
      case TId("new") =>
        throw new IllegalArgumentException("MiniJs: 'new' is not supported")
      case TId(name) => Id(name)
      case TPunct("(") => val e = expr(); eat(")"); e
      case TPunct("[") =>
        val items = mutable.ArrayBuffer[Node]()
        while (!isP("]")) {
          items += assignment()
          if (isP(",")) next()
        }
        eat("]")
        ArrLit(items.toSeq)
      case TPunct("{") =>
        val entries = mutable.ArrayBuffer[(String, Node)]()
        while (!isP("}")) {
          val key = next() match {
            case TId(k) => k
            case TStr(k) => k
            case TNum(v) => numToString(v)
            case t => throw new IllegalArgumentException(s"bad object key: $t")
          }
          eat(":")
          entries += (key -> assignment())
          if (isP(",")) next()
        }
        eat("}")
        ObjLit(entries.toSeq)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }
  }

  // ---------- evaluation ----------
  private final class Env(val parent: Env) {
    val vars: mutable.Map[String, Any] = mutable.Map.empty
    def lookup(name: String): Option[Env] =
      if (vars.contains(name)) Some(this)
      else if (parent != null) parent.lookup(name) else None
    def get(name: String): Any = lookup(name) match {
      case Some(e) => e.vars(name)
      case None => throw new IllegalArgumentException(s"ReferenceError: $name is not defined")
    }
    def set(name: String, v: Any): Unit = lookup(name) match {
      case Some(e) => e.vars(name) = v
      case None => vars(name) = v // implicit global, JS-style
    }
    def declare(name: String, v: Any): Unit = vars(name) = v
  }

  private case class ReturnEx(v: Any) extends RuntimeException(null, null, false, false)
  private case object BreakEx extends RuntimeException(null, null, false, false)
  private case object ContinueEx extends RuntimeException(null, null, false, false)
  final case class JsError(value: Any)
    extends RuntimeException(toJsString(value), null, false, false)

  private final class UserFunc(params: Seq[String], body: Seq[Node],
                               closure: Env, interp: Interp) extends Callable {
    def call(args: Seq[Any]): Any = {
      val env = new Env(closure)
      params.zipWithIndex.foreach { case (p, i) =>
        env.declare(p, if (i < args.length) args(i) else JsUndefined)
      }
      env.declare("arguments", new JsArr(mutable.ArrayBuffer(args: _*)))
      try { body.foreach(interp.exec(_, env)); JsUndefined }
      catch { case ReturnEx(v) => v }
    }
  }

  private final class Interp(val maxSteps: Long) {
    private var steps = 0L
    private[MiniJs] def resetBudget(): Unit = steps = 0L
    private def tick(): Unit = {
      steps += 1
      if (steps > maxSteps)
        throw new IllegalStateException(
          s"MiniJs: step budget exceeded ($maxSteps ops) — runaway script?")
    }

    def exec(node: Node, env: Env): Unit = { tick(); node match {
      case FuncLit(Some(name), ps, body) =>
        env.declare(name, new UserFunc(ps, body, env, this))
      case VarDecl(decls) =>
        decls.foreach { case (n, init) =>
          env.declare(n, init.map(eval(_, env)).getOrElse(JsUndefined))
        }
      case If(c, t, f) =>
        if (truthy(eval(c, env))) exec(t, env) else f.foreach(exec(_, env))
      case While(c, body, doWhile) =>
        var first = doWhile
        while (first || truthy(eval(c, env))) {
          first = false
          try exec(body, new Env(env))
          catch { case BreakEx => return; case ContinueEx => () }
        }
      case For(init, cond, post, body) =>
        val scope = new Env(env)
        init.foreach {
          case v: VarDecl => exec(v, scope)
          case e => eval(e, scope)
        }
        while (cond.forall(c => truthy(eval(c, scope)))) {
          try exec(body, new Env(scope))
          catch { case BreakEx => return; case ContinueEx => () }
          post.foreach(eval(_, scope))
        }
      case ForOf(v, seqE, body) =>
        val it = eval(seqE, env) match {
          case a: JsArr => a.items.toSeq
          case s: String => s.map(_.toString)
          case o: JsObj => o.fields.keys.toSeq // lenient: keys
          case other => throw new IllegalArgumentException(s"not iterable: ${typeOf(other)}")
        }
        for (item <- it) {
          val scope = new Env(env)
          scope.declare(v, item)
          try exec(body, scope)
          catch { case BreakEx => return; case ContinueEx => () }
        }
      case Return(e) => throw ReturnEx(e.map(eval(_, env)).getOrElse(JsUndefined))
      case BreakStmt => throw BreakEx
      case ContinueStmt => throw ContinueEx
      case Throw(e) => throw JsError(eval(e, env))
      case Block(stmts) =>
        val scope = new Env(env)
        stmts.foreach(exec(_, scope))
      case e => eval(e, env)
    } }

    def eval(node: Node, env: Env): Any = { tick(); node match {
      case Num(v) => v
      case Str(v) => v
      case Bool(v) => v
      case NullLit => JsNull
      case UndefLit => JsUndefined
      case Id(name) => env.get(name)
      case ArrLit(items) => new JsArr(mutable.ArrayBuffer(items.map(eval(_, env)): _*))
      case ObjLit(entries) =>
        val m = mutable.LinkedHashMap[String, Any]()
        entries.foreach { case (k, v) => m(k) = eval(v, env) }
        new JsObj(m)
      case FuncLit(_, ps, body) => new UserFunc(ps, body, env, this)
      case Unary("!", e) => !truthy(eval(e, env))
      case Unary("-", e) => -toNumber(eval(e, env))
      case Unary("+", e) => toNumber(eval(e, env))
      case Unary("typeof", e) =>
        val v = try eval(e, env) catch { case _: IllegalArgumentException => JsUndefined }
        typeOf(v)
      case Unary(op, _) => throw new IllegalArgumentException(s"unary $op unsupported")
      case Update(op, target, prefix) =>
        val old = toNumber(eval(target, env))
        val nv = if (op == "++") old + 1 else old - 1
        assignTo(target, nv, env)
        if (prefix) nv else old
      case Binary(op, l, r) => binary(op, eval(l, env), eval(r, env))
      case Logical("&&", l, r) =>
        val lv = eval(l, env)
        if (!truthy(lv)) lv else eval(r, env)
      case Logical("||", l, r) =>
        val lv = eval(l, env)
        if (truthy(lv)) lv else eval(r, env)
      case Logical(op, _, _) => throw new IllegalArgumentException(s"logical $op unsupported")
      case Cond(c, t, f) => if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
      case Assign("=", target, value) =>
        val v = eval(value, env)
        assignTo(target, v, env)
        v
      case Assign(op, target, value) =>
        val cur = eval(target, env)
        val v = binary(op.stripSuffix("="), cur, eval(value, env))
        assignTo(target, v, env)
        v
      case Member(obj, name) => member(eval(obj, env), name)
      case IndexN(obj, idxE) =>
        val o = eval(obj, env)
        val idx = eval(idxE, env)
        o match {
          case a: JsArr =>
            val i = toNumber(idx).toInt
            if (i >= 0 && i < a.items.length) a.items(i) else JsUndefined
          case s: String =>
            val i = toNumber(idx).toInt
            if (i >= 0 && i < s.length) s(i).toString else JsUndefined
          case m: JsObj => m.fields.getOrElse(toJsString(idx), JsUndefined)
          case other => member(other, toJsString(idx))
        }
      case Call(callee, argEs) =>
        val args = argEs.map(eval(_, env))
        val fn = callee match {
          case m: Member => member(eval(m.obj, env), m.name)
          case IndexN(obj, idxE) => member(eval(obj, env), toJsString(eval(idxE, env)))
          case other => eval(other, env)
        }
        fn match {
          case c: Callable => c.call(args)
          case other =>
            throw new IllegalArgumentException(s"TypeError: ${typeOf(other)} is not a function")
        }
      case other => throw new IllegalArgumentException(s"cannot evaluate $other")
    } }

    private def assignTo(target: Node, v: Any, env: Env): Unit = target match {
      case Id(name) => env.set(name, v)
      case Member(objE, name) => eval(objE, env) match {
        case o: JsObj => o.fields(name) = v
        case a: JsArr if name == "length" =>
          val nl = toNumber(v).toInt
          if (nl < a.items.length) a.items.remove(nl, a.items.length - nl)
          else while (a.items.length < nl) a.items += JsUndefined
        case other => throw new IllegalArgumentException(
          s"cannot set property '$name' on ${typeOf(other)}")
      }
      case IndexN(objE, idxE) =>
        val idx = eval(idxE, env)
        eval(objE, env) match {
          case a: JsArr =>
            val i = toNumber(idx).toInt
            while (a.items.length <= i) a.items += JsUndefined
            a.items(i) = v
          case o: JsObj => o.fields(toJsString(idx)) = v
          case other => throw new IllegalArgumentException(
            s"cannot index-assign on ${typeOf(other)}")
        }
      case other => throw new IllegalArgumentException(s"invalid assignment target $other")
    }

    private def member(obj: Any, name: String): Any = (obj, name) match {
      case (s: String, "length") => s.length.toDouble
      case (a: JsArr, "length") => a.items.length.toDouble
      case (o: JsObj, n) => o.fields.getOrElse(n, JsUndefined)
      case (s: String, m) => stringMethod(s, m)
      case (a: JsArr, m) => arrayMethod(a, m)
      case (d: java.lang.Double, m) => numberMethod(d, m)
      // unknown statics yield undefined like any JS property miss —
      // feature probes (`Number.parseFloat || parseFloat`) must work
      case (no: NativeObj, n) => no.statics.getOrElse(n, JsUndefined)
      case (JsNull | JsUndefined, n) =>
        throw new IllegalArgumentException(s"TypeError: cannot read '$n' of ${toJsString(obj)}")
      case (other, n) =>
        throw new IllegalArgumentException(s"no property '$n' on ${typeOf(other)}")
    }

    private def numberMethod(d: Double, m: String): Any = m match {
      case "toFixed" => fn { a =>
        val dp = if (a.isEmpty) 0 else toNumber(a.head).toInt
        String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(d))
      }
      case "toString" => fn { a =>
        if (a.isEmpty) numToString(d)
        else {
          val radix = toNumber(a.head).toInt
          require(radix >= 2 && radix <= 36, s"toString() radix must be between 2 and 36")
          if (d.isNaN || d.isInfinite) numToString(d) // "NaN"/"Infinity", JS-style
          else {
            val neg = d < 0
            var x = math.abs(d)
            val intPart = java.lang.Long.toString(x.toLong, radix)
            x -= x.toLong
            val sb = new StringBuilder(if (neg) "-" + intPart else intPart)
            if (x > 0) { // fractional digits in the radix, JS-style
              sb += '.'
              var digits = 0
              while (x > 0 && digits < 20) {
                x *= radix
                sb += java.lang.Character.forDigit(x.toInt, radix)
                x -= x.toInt
                digits += 1
              }
            }
            sb.toString
          }
        }
      }
      case other => throw new IllegalArgumentException(s"no number method '$other'")
    }

    private def fn(f: Seq[Any] => Any): Callable = (args: Seq[Any]) => f(args)

    private def stringMethod(s: String, m: String): Any = m match {
      case "charAt" => fn(a => { val i = toNumber(a.head).toInt; if (i >= 0 && i < s.length) s(i).toString else "" })
      case "charCodeAt" => fn(a => { val i = if (a.isEmpty) 0 else toNumber(a.head).toInt; if (i >= 0 && i < s.length) s(i).toDouble else Double.NaN })
      case "indexOf" => fn(a => s.indexOf(toJsString(a.head)).toDouble)
      case "lastIndexOf" => fn(a => s.lastIndexOf(toJsString(a.head)).toDouble)
      case "includes" => fn(a => s.contains(toJsString(a.head)))
      case "startsWith" => fn(a => s.startsWith(toJsString(a.head)))
      case "endsWith" => fn(a => s.endsWith(toJsString(a.head)))
      case "toUpperCase" => fn(_ => s.toUpperCase)
      case "toLowerCase" => fn(_ => s.toLowerCase)
      case "trim" => fn(_ => s.trim)
      case "slice" => fn(a => {
        val len = s.length
        var from = if (a.nonEmpty) toNumber(a.head).toInt else 0
        var to = if (a.length > 1) toNumber(a(1)).toInt else len
        if (from < 0) from = math.max(0, len + from)
        if (to < 0) to = math.max(0, len + to)
        if (from >= math.min(to, len)) "" else s.substring(from, math.min(to, len))
      })
      case "substring" => fn(a => {
        val len = s.length
        val from = math.min(math.max(0, if (a.nonEmpty) toNumber(a.head).toInt else 0), len)
        val to = math.min(math.max(0, if (a.length > 1) toNumber(a(1)).toInt else len), len)
        s.substring(math.min(from, to), math.max(from, to))
      })
      case "split" => fn(a => {
        val items =
          if (a.isEmpty) Seq(s)
          else {
            val sep = toJsString(a.head)
            if (sep.isEmpty) s.map(_.toString)
            else s.split(java.util.regex.Pattern.quote(sep), -1).toSeq
          }
        new JsArr(mutable.ArrayBuffer(items: _*))
      })
      case "replace" => fn(a =>
        s.replaceFirst(java.util.regex.Pattern.quote(toJsString(a.head)),
          java.util.regex.Matcher.quoteReplacement(toJsString(a(1)))))
      case "replaceAll" => fn(a => s.replace(toJsString(a.head), toJsString(a(1))))
      case "concat" => fn(a => s + a.map(toJsString).mkString)
      case "repeat" => fn(a => s * toNumber(a.head).toInt)
      case "padStart" => fn(a => {
        val w = toNumber(a.head).toInt
        val p = if (a.length > 1) toJsString(a(1)) else " "
        var r = s
        while (r.length < w && p.nonEmpty) r = p.substring(0, math.min(p.length, w - r.length)) + r
        r
      })
      case "toString" => fn(_ => s)
      case other => throw new IllegalArgumentException(s"no string method '$other'")
    }

    private def arrayMethod(a: JsArr, m: String): Any = m match {
      case "push" => fn(args => { a.items ++= args; a.items.length.toDouble })
      case "pop" => fn(_ => if (a.items.isEmpty) JsUndefined else a.items.remove(a.items.length - 1))
      case "shift" => fn(_ => if (a.items.isEmpty) JsUndefined else a.items.remove(0))
      case "unshift" => fn(args => { a.items.prependAll(args); a.items.length.toDouble })
      case "indexOf" => fn(args => a.items.indexWhere(strictEq(_, args.head)).toDouble)
      case "includes" => fn(args => a.items.exists(strictEq(_, args.head)))
      case "join" => fn(args => {
        val sep = if (args.nonEmpty) toJsString(args.head) else ","
        a.items.map(v => if (v == JsNull || v == JsUndefined) "" else toJsString(v)).mkString(sep)
      })
      case "slice" => fn(args => {
        val len = a.items.length
        var from = if (args.nonEmpty) toNumber(args.head).toInt else 0
        var to = if (args.length > 1) toNumber(args(1)).toInt else len
        if (from < 0) from = math.max(0, len + from)
        if (to < 0) to = math.max(0, len + to)
        new JsArr(a.items.slice(from, math.min(to, len)).clone())
      })
      case "concat" => fn(args => {
        val out = a.items.clone()
        args.foreach {
          case b: JsArr => out ++= b.items
          case v => out += v
        }
        new JsArr(out)
      })
      case "reverse" => fn(_ => { val r = a.items.reverse; a.items.clear(); a.items ++= r; a })
      case "map" => fn(args => {
        val f = args.head.asInstanceOf[Callable]
        new JsArr(a.items.zipWithIndex.map { case (v, i) => f.call(Seq(v, i.toDouble, a)) })
      })
      case "filter" => fn(args => {
        val f = args.head.asInstanceOf[Callable]
        new JsArr(a.items.zipWithIndex.collect {
          case (v, i) if truthy(f.call(Seq(v, i.toDouble, a))) => v
        })
      })
      case "forEach" => fn(args => {
        val f = args.head.asInstanceOf[Callable]
        a.items.zipWithIndex.foreach { case (v, i) => f.call(Seq(v, i.toDouble, a)) }
        JsUndefined
      })
      case "reduce" => fn(args => {
        val f = args.head.asInstanceOf[Callable]
        var (acc, start) =
          if (args.length > 1) (args(1), 0)
          else {
            require(a.items.nonEmpty, "reduce of empty array with no initial value")
            (a.items.head, 1)
          }
        var i = start
        while (i < a.items.length) { acc = f.call(Seq(acc, a.items(i), i.toDouble, a)); i += 1 }
        acc
      })
      case "some" => fn(args => {
        val f = args.head.asInstanceOf[Callable]
        a.items.zipWithIndex.exists { case (v, i) => truthy(f.call(Seq(v, i.toDouble, a))) }
      })
      case "every" => fn(args => {
        val f = args.head.asInstanceOf[Callable]
        a.items.zipWithIndex.forall { case (v, i) => truthy(f.call(Seq(v, i.toDouble, a))) }
      })
      case "sort" => fn(args => {
        val sorted = args.headOption match {
          case Some(f: Callable) =>
            a.items.sortWith((x, y) => toNumber(f.call(Seq(x, y))) < 0)
          case _ => a.items.sortBy(toJsString)
        }
        a.items.clear(); a.items ++= sorted; a
      })
      case "toString" => fn(_ => a.items.map(toJsString).mkString(","))
      case other => throw new IllegalArgumentException(s"no array method '$other'")
    }

    private def binary(op: String, l: Any, r: Any): Any = op match {
      case "+" =>
        (l, r) match {
          case (a: String, b) => a + toJsString(b)
          case (a, b: String) => toJsString(a) + b
          case (a: JsArr, b) => toJsString(a) + toJsString(b)
          case (a, b: JsArr) => toJsString(a) + toJsString(b)
          case (a: JsObj, b) => toJsString(a) + toJsString(b)
          case (a, b: JsObj) => toJsString(a) + toJsString(b)
          case (a, b) => toNumber(a) + toNumber(b)
        }
      case "-" => toNumber(l) - toNumber(r)
      case "*" => toNumber(l) * toNumber(r)
      case "/" => toNumber(l) / toNumber(r)
      case "%" => toNumber(l) % toNumber(r)
      case "<" | ">" | "<=" | ">=" =>
        val res = (l, r) match {
          case (a: String, b: String) => a.compareTo(b).toDouble
          case (a, b) => toNumber(a) - toNumber(b)
        }
        op match {
          case "<" => res < 0
          case ">" => res > 0
          case "<=" => res <= 0
          case _ => res >= 0
        }
      case "===" => strictEq(l, r)
      case "!==" => !strictEq(l, r)
      case "==" => looseEq(l, r)
      case "!=" => !looseEq(l, r)
      case other => throw new IllegalArgumentException(s"operator $other unsupported")
    }
  }

  private def strictEq(l: Any, r: Any): Boolean = (l, r) match {
    case (a: java.lang.Double, b: java.lang.Double) => a.doubleValue == b.doubleValue
    case (a: JsArr, b: JsArr) => a eq b
    case (a: JsObj, b: JsObj) => a eq b
    case _ => l == r
  }

  private def looseEq(l: Any, r: Any): Boolean = (l, r) match {
    case (JsNull | JsUndefined, JsNull | JsUndefined) => true
    case (JsNull | JsUndefined, _) | (_, JsNull | JsUndefined) => false
    case (a: String, b: java.lang.Double) => toNumber(a) == b.doubleValue
    case (a: java.lang.Double, b: String) => a.doubleValue == toNumber(b)
    case (a: java.lang.Boolean, b) => looseEq(if (a) 1.0 else 0.0, b)
    case (a, b: java.lang.Boolean) => looseEq(a, if (b) 1.0 else 0.0)
    case _ => strictEq(l, r)
  }

  def truthy(v: Any): Boolean = v match {
    case b: java.lang.Boolean => b
    case d: java.lang.Double => d.doubleValue != 0 && !d.isNaN
    case s: String => s.nonEmpty
    case JsNull | JsUndefined => false
    case _ => true
  }

  def toNumber(v: Any): Double = v match {
    case d: java.lang.Double => d
    case b: java.lang.Boolean => if (b) 1.0 else 0.0
    case s: String =>
      val t = s.trim
      if (t.isEmpty) 0.0
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case JsNull => 0.0
    case JsUndefined => Double.NaN
    case a: JsArr if a.items.isEmpty => 0.0
    case a: JsArr if a.items.length == 1 => toNumber(a.items.head)
    case _ => Double.NaN
  }

  def numToString(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isInfinite) { if (d > 0) "Infinity" else "-Infinity" }
    else if (d == math.rint(d) && math.abs(d) < 1e21) {
      val l = d.toLong
      l.toString
    } else d.toString

  def toJsString(v: Any): String = v match {
    case s: String => s
    case d: java.lang.Double => numToString(d)
    case b: java.lang.Boolean => b.toString
    case JsNull => "null"
    case JsUndefined => "undefined"
    case a: JsArr => a.items.map(x => if (x == JsNull || x == JsUndefined) "" else toJsString(x)).mkString(",")
    case _: JsObj => "[object Object]"
    case _: Callable => "function"
    case other => String.valueOf(other)
  }

  private def typeOf(v: Any): String = v match {
    case _: java.lang.Double => "number"
    case _: String => "string"
    case _: java.lang.Boolean => "boolean"
    case JsUndefined => "undefined"
    case _: Callable => "function"
    case _ => "object" // null, arrays, objects — JS quirk preserved
  }

  def stringify(v: Any): String = v match {
    case s: String =>
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb.append('"').toString
    case d: java.lang.Double => if (d.isNaN || d.isInfinite) "null" else numToString(d)
    case b: java.lang.Boolean => b.toString
    case JsNull | JsUndefined => "null"
    case a: JsArr => a.items.map(stringify).mkString("[", ",", "]")
    case o: JsObj =>
      o.fields.map { case (k, fv) => stringify(k) + ":" + stringify(fv) }.mkString("{", ",", "}")
    case other => stringify(String.valueOf(other))
  }

  private def parseJson(s: String): Any = {
    import org.json4s._
    def conv(j: JValue): Any = j match {
      case JString(v) => v
      case JInt(v) => v.toDouble
      case JLong(v) => v.toDouble
      case JDouble(v) => v
      case JDecimal(v) => v.toDouble
      case JBool(v) => v
      case JNull | JNothing => JsNull
      case JArray(items) => new JsArr(mutable.ArrayBuffer(items.map(conv): _*))
      case JObject(fields) =>
        val m = mutable.LinkedHashMap[String, Any]()
        fields.foreach { case (k, v) => m(k) = conv(v) }
        new JsObj(m)
      case JSet(items) => new JsArr(mutable.ArrayBuffer(items.toSeq.map(conv): _*))
    }
    conv(org.json4s.jackson.JsonMethods.parse(s))
  }

  private def globals(interp: Interp): Env = {
    val g = new Env(null)
    def fn(f: Seq[Any] => Any): Callable = (args: Seq[Any]) => f(args)
    def mathFn(f: Double => Double): Callable = fn(a => f(toNumber(a.head)))

    val mathObj = new JsObj(mutable.LinkedHashMap[String, Any](
      "abs" -> mathFn(math.abs), "floor" -> mathFn(math.floor),
      "ceil" -> mathFn(math.ceil), "round" -> mathFn(d => math.floor(d + 0.5)),
      "trunc" -> mathFn(d => if (d < 0) math.ceil(d) else math.floor(d)),
      "sqrt" -> mathFn(math.sqrt), "cbrt" -> mathFn(math.cbrt),
      "exp" -> mathFn(math.exp), "log" -> mathFn(math.log),
      "log2" -> mathFn(d => math.log(d) / math.log(2)), "log10" -> mathFn(math.log10),
      "sin" -> mathFn(math.sin), "cos" -> mathFn(math.cos), "tan" -> mathFn(math.tan),
      "atan" -> mathFn(math.atan), "asin" -> mathFn(math.asin), "acos" -> mathFn(math.acos),
      "sign" -> mathFn(math.signum),
      "pow" -> fn(a => math.pow(toNumber(a.head), toNumber(a(1)))),
      "atan2" -> fn(a => math.atan2(toNumber(a.head), toNumber(a(1)))),
      "max" -> fn(a => if (a.isEmpty) Double.NegativeInfinity else a.map(toNumber).max),
      "min" -> fn(a => if (a.isEmpty) Double.PositiveInfinity else a.map(toNumber).min),
      "hypot" -> fn(a => math.sqrt(a.map(x => { val v = toNumber(x); v * v }).sum)),
      "PI" -> math.Pi, "E" -> math.E))
    g.declare("Math", mathObj)

    g.declare("JSON", new JsObj(mutable.LinkedHashMap[String, Any](
      "stringify" -> fn(a => stringify(a.head)),
      "parse" -> fn(a => parseJson(toJsString(a.head))))))

    g.declare("parseInt", fn { a =>
      // JS parseInt: longest valid digit prefix for the radix
      var s = toJsString(a.head).trim
      val radix = if (a.length > 1 && toNumber(a(1)).toInt != 0) toNumber(a(1)).toInt else 10
      var sign = 1.0
      if (s.startsWith("-")) { sign = -1.0; s = s.drop(1) }
      else if (s.startsWith("+")) s = s.drop(1)
      if (radix == 16 && (s.startsWith("0x") || s.startsWith("0X"))) s = s.drop(2)
      val digits = s.takeWhile(c => Character.digit(c, radix) >= 0)
      if (digits.isEmpty) Double.NaN
      else sign * digits.foldLeft(0.0)((acc, c) => acc * radix + Character.digit(c, radix))
    })
    g.declare("parseFloat", fn { a =>
      "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?".r
        .findFirstIn(toJsString(a.head).trim)
        .map(_.toDouble).getOrElse(Double.NaN): Any
    })
    g.declare("isNaN", fn(a => toNumber(a.head).isNaN))
    g.declare("isFinite", fn(a => { val d = toNumber(a.head); !d.isNaN && !d.isInfinite }))
    g.declare("String", new NativeObj(
      a => if (a.isEmpty) "" else toJsString(a.head),
      Map("fromCharCode" -> fn(a => a.map(x => toNumber(x).toInt.toChar).mkString))))
    g.declare("Number", new NativeObj(
      a => if (a.isEmpty) 0.0 else toNumber(a.head),
      Map(
        "isInteger" -> fn(a => a.head match {
          case d: java.lang.Double => !d.isNaN && !d.isInfinite && d.doubleValue == math.rint(d.doubleValue)
          case _ => false
        }),
        "isFinite" -> fn(a => a.head match {
          case d: java.lang.Double => !d.isNaN && !d.isInfinite
          case _ => false
        }),
        "MAX_SAFE_INTEGER" -> 9007199254740991.0,
        "MIN_SAFE_INTEGER" -> -9007199254740991.0)))
    g.declare("Boolean", fn(a => a.nonEmpty && truthy(a.head)))
    g.declare("Object", new NativeObj(
      a => a.headOption.getOrElse(new JsObj(mutable.LinkedHashMap())),
      Map(
        "keys" -> fn(a => a.head match {
          case o: JsObj => new JsArr(mutable.ArrayBuffer(o.fields.keys.toSeq: _*))
          case arr: JsArr => new JsArr(mutable.ArrayBuffer(arr.items.indices.map(i => numToString(i)): _*))
          case other => throw new IllegalArgumentException(s"Object.keys on ${toJsString(other)}")
        }),
        "values" -> fn(a => a.head match {
          case o: JsObj => new JsArr(mutable.ArrayBuffer(o.fields.values.toSeq: _*))
          case arr: JsArr => new JsArr(arr.items.clone())
          case other => throw new IllegalArgumentException(s"Object.values on ${toJsString(other)}")
        }),
        "entries" -> fn(a => a.head match {
          case o: JsObj => new JsArr(mutable.ArrayBuffer(o.fields.toSeq.map { case (k, v) =>
            new JsArr(mutable.ArrayBuffer[Any](k, v)): Any
          }: _*))
          case other => throw new IllegalArgumentException(s"Object.entries on ${toJsString(other)}")
        }))))
    g.declare("Array", new NativeObj(
      {
        // JS Array(n): single numeric arg = length-n array
        case Seq(d: java.lang.Double) =>
          require(d.doubleValue == math.rint(d.doubleValue) && d >= 0,
            "invalid array length")
          new JsArr(mutable.ArrayBuffer.fill[Any](d.toInt)(JsUndefined))
        case a => new JsArr(mutable.ArrayBuffer(a: _*))
      },
      Map("isArray" -> fn(a => a.headOption.exists(_.isInstanceOf[JsArr])))))
    // Date.now() only — `new Date()` stays rejected (no object model)
    g.declare("Date", new NativeObj(
      _ => throw new IllegalArgumentException("Date() needs 'new'; only Date.now() is supported"),
      Map("now" -> fn(_ => System.currentTimeMillis().toDouble))))
    g.declare("NaN", Double.NaN)
    g.declare("Infinity", Double.PositiveInfinity)
    // the reference exposes log() to scripts (script/overview.md example)
    g.declare("log", fn(_ => JsUndefined))
    g
  }

  /** Parse + run a script, returning its global environment handle. */
  final class Program private[MiniJs] (env: Env, interp: Interp) {
    /** Look up a global function by name (None if absent/not a function).
      * The step budget resets per invocation — it bounds one call, not
      * the program's lifetime.
      */
    def function(name: String): Option[Seq[Any] => Any] =
      env.lookup(name).map(_.vars(name)).collect {
        case c: Callable => (args: Seq[Any]) => { interp.resetBudget(); c.call(args) }
      }
  }

  /** Static purity check backing [[graft.plugins.JsCallExpr]]'s
    * determinism flag: true when the script's top level declares ONLY
    * functions (so there is no shared mutable global for calls to
    * communicate through) and nothing in any function reads `Date` or
    * the shared `log` hook. Conservative by construction — any
    * top-level var/statement or any `Date` mention marks the script
    * stateful, never the reverse — so Catalyst may CSE / push / reuse
    * calls exactly when that is provably safe.
    */
  def isPure(script: String): Boolean = {
    val stmts = try new Parser(lex(script)).program() catch {
      case _: Exception => return false // load() will surface the parse error
    }
    // every name declared ANYWHERE inside a top-level function (params,
    // vars, nested function names, for..of binders) is call-local:
    // its state is fresh per invocation. Cross-call persistence can
    // only flow through a binding OUTSIDE that set — a global function
    // slot, a shared builtin object (JSON.n = …), another top-level
    // function's name — so any write whose l-value roots at a
    // non-local name marks the script stateful.
    def locals(n: Any, acc: scala.collection.mutable.Set[String]): Unit = n match {
      case FuncLit(name, params, body) =>
        name.foreach(acc += _); acc ++= params; body.foreach(locals(_, acc))
      case VarDecl(names) =>
        names.foreach { case (nm, init) => acc += nm; init.foreach(locals(_, acc)) }
      case ForOf(v, seq, body) => acc += v; locals(seq, acc); locals(body, acc)
      case s: Seq[_] => s.foreach(locals(_, acc))
      case o: Option[_] => o.foreach(locals(_, acc))
      case p: Product => p.productIterator.foreach(locals(_, acc))
      case _ => ()
    }
    def rootName(n: Node): Option[String] = n match {
      case Id(name) => Some(name)
      case Member(obj, _) => rootName(obj)
      case IndexN(obj, _) => rootName(obj)
      case _ => None
    }
    def impure(n: Any, local: String => Boolean): Boolean = n match {
      case Id("Date") | Id("log") => true
      case Assign(_, target, value) =>
        !rootName(target).exists(local) || impure(target, local) || impure(value, local)
      case Update(_, target, _) => !rootName(target).exists(local) || impure(target, local)
      case s: Seq[_] => s.exists(impure(_, local))
      case o: Option[_] => o.exists(impure(_, local))
      case p: Product => p.productIterator.exists(impure(_, local))
      case _ => false
    }
    stmts.forall {
      case f: FuncLit =>
        val acc = scala.collection.mutable.Set.empty[String]
        locals(f, acc)
        !impure(f, acc.contains)
      case _ => false
    }
  }

  /** Interpret the script's top level (declarations run now). */
  def load(script: String, maxSteps: Long = 2_000_000L): Program = {
    val interp = new Interp(maxSteps)
    val env = new Env(globals(interp))
    new Parser(lex(script)).program().foreach(interp.exec(_, env))
    new Program(env, interp)
  }
}
