package graft

import graft.plugins.{JsFunctions, JsScript, MiniJs}
import graft.rules.{RuleApi, RuleEngine}
import org.apache.spark.sql.functions._

/** JavaScript script functions (SURVEY §2.5 / reference
  * internal/plugin/js): the MiniJs interpreter's language surface,
  * the SQL registration path, and the /udf/javascript REST CRUD.
  */
class MiniJsSpec extends SparkSuite {

  private def run(script: String, fn: String, args: Any*): Any =
    MiniJs.load(script).function(fn).get(args.toSeq)

  // ---- interpreter semantics ----

  test("arithmetic, precedence, strings, coercions") {
    assert(run("function f(x, y) { return x * y + 1; }", "f", 6.0, 7.0) == 43.0)
    assert(run("function f(a, b) { return a + ' & ' + b; }", "f", "x", 2.0) == "x & 2")
    // JS +: number + string concatenates; '5'*'4' is numeric
    assert(run("function f() { return '5' * '4'; }", "f") == 20.0)
    assert(run("function f() { return 1 + '1'; }", "f") == "11")
    assert(run("function f() { return '' + 1.5; }", "f") == "1.5")
    assert(run("function f() { return 0.1 + 0.2 > 0.3 - 1e-9; }", "f") == true)
    assert(run("function f() { return 7 % 3; }", "f") == 1.0)
  }

  test("equality: loose coercion vs strict") {
    assert(run("function f() { return 1 == '1'; }", "f") == true)
    assert(run("function f() { return 1 === '1'; }", "f") == false)
    assert(run("function f() { return null == undefined; }", "f") == true)
    assert(run("function f() { return null === undefined; }", "f") == false)
    assert(run("function f() { return true == 1; }", "f") == true)
  }

  test("control flow: if/while/for/for-of, break/continue, do-while") {
    val fib = "function fib(n) { var a = 0, b = 1; for (var i = 0; i < n; i++) { var t = a + b; a = b; b = t; } return a; }"
    assert(run(fib, "fib", 10.0) == 55.0)
    val collatz = """function steps(n) {
      var c = 0;
      while (n != 1) { if (n % 2 == 0) { n = n / 2; } else { n = 3 * n + 1; } c++; }
      return c;
    }"""
    assert(run(collatz, "steps", 27.0) == 111.0)
    val sumEvens = """function s(xs) {
      var total = 0;
      for (var x of xs) { if (x % 2 != 0) continue; if (x > 100) break; total += x; }
      return total;
    }"""
    val arr = new MiniJs.JsArr(scala.collection.mutable.ArrayBuffer[Any](1.0, 2.0, 3.0, 4.0, 200.0))
    assert(run(sumEvens, "s", arr) == 6.0)
    assert(run("function f() { var i = 0; do { i++; } while (i < 3); return i; }", "f") == 3.0)
  }

  test("closures, higher-order functions, recursion") {
    val counter = """function make() {
      var n = 0;
      return function() { n++; return n; };
    }
    function f() { var c = make(); c(); c(); return c(); }"""
    assert(run(counter, "f") == 3.0)
    assert(run("function fact(n) { return n <= 1 ? 1 : n * fact(n - 1); }", "fact", 6.0) == 720.0)
  }

  test("arrays and objects: literals, methods, mutation") {
    assert(run("function f(xs) { return xs.map(function(x) { return x * 2; }).join('-'); }",
      "f", new MiniJs.JsArr(scala.collection.mutable.ArrayBuffer[Any](1.0, 2.0, 3.0))) == "2-4-6")
    assert(run("function f() { var a = [3, 1, 2]; a.sort(function(x, y) { return x - y; }); return a.join(','); }",
      "f") == "1,2,3")
    assert(run("function f() { var a = []; for (var i = 0; i < 4; i++) a.push(i * i); return a.reduce(function(s, x) { return s + x; }, 0); }",
      "f") == 14.0)
    assert(run("function f() { var o = { a: 1, b: { c: 'deep' } }; o.d = o.a + 1; return o.b.c + o['d']; }",
      "f") == "deep2")
    assert(run("function f(xs) { return xs.filter(function(x) { return x > 1; }).length; }",
      "f", new MiniJs.JsArr(scala.collection.mutable.ArrayBuffer[Any](1.0, 2.0, 3.0))) == 2.0)
  }

  test("string methods and Math") {
    assert(run("function f(s) { return s.toUpperCase().split(' ').join('_'); }",
      "f", "hello big world") == "HELLO_BIG_WORLD")
    assert(run("function f(s) { return s.substring(1, 4) + s.charAt(0) + s.indexOf('l'); }",
      "f", "hello") == "ellh2")
    assert(run("function f(x, y) { return Math.sqrt(x * x + y * y); }", "f", 3.0, 4.0) == 5.0)
    assert(run("function f() { return Math.max(1, 9, 4) + Math.min(2, -3); }", "f") == 6.0)
    assert(run("function f() { return Math.round(2.5) + Math.floor(2.9) + Math.ceil(2.1); }", "f") == 8.0)
  }

  test("JSON parse/stringify round-trip") {
    assert(run("""function f(s) { var o = JSON.parse(s); return o.items[1].v * 10; }""",
      "f", """{"items":[{"v":1},{"v":7}]}""") == 70.0)
    assert(run("""function f() { return JSON.stringify({ a: [1, "two", null], b: true }); }""",
      "f") == """{"a":[1,"two",null],"b":true}""")
  }

  test("typeof, parseInt/parseFloat, ternary, logical operators return operands") {
    assert(run("function f(x) { return typeof x; }", "f", 1.0) == "number")
    assert(run("function f() { return typeof undeclared; }", "f") == "undefined")
    assert(run("function f() { return parseInt('42px') + parseFloat('3.5kg'); }", "f") == 45.5)
    assert(run("function f(x) { return x || 'default'; }", "f", "") == "default")
    assert(run("function f(x) { return x && x.length; }", "f", "abc") == 3.0)
  }

  test("built-in statics: Object.keys/values, Array.isArray, String.fromCharCode, toFixed") {
    assert(run("function f() { return Object.keys({ a: 1, b: 2 }).join(','); }", "f") == "a,b")
    assert(run("function f() { return Object.values({ a: 1, b: 2 }).reduce(function(s, x) { return s + x; }, 0); }", "f") == 3.0)
    assert(run("function f() { var t = 0; for (var e of Object.entries({ x: 5, y: 6 })) t += e[1]; return t; }", "f") == 11.0)
    assert(run("function f(x) { return Array.isArray(x); }", "f",
      new MiniJs.JsArr(scala.collection.mutable.ArrayBuffer[Any](1.0))) == true)
    assert(run("function f() { return Array.isArray('nope'); }", "f") == false)
    assert(run("function f() { return String.fromCharCode(72, 105); }", "f") == "Hi")
    assert(run("function f(x) { return x.toFixed(2); }", "f", 3.14159) == "3.14")
    assert(run("function f() { return (255).toString(16); }", "f") == "ff")
    assert(run("function f() { return (3.5).toString(2); }", "f") == "11.1")
    assert(run("function f() { return (1 / 0).toString(16); }", "f") == "Infinity")
    assert(run("function f() { return Number.isInteger(4) && !Number.isInteger(4.5); }", "f") == true)
    assert(run("function f() { return Date.now() > 0; }", "f") == true)
    // unknown statics are undefined (feature probes must not throw)
    assert(run("function f() { return Number.parseFloat || 'fallback'; }", "f") == "fallback")
    // Array(n) is a length-n array, JS-style
    assert(run("function f() { return Array(3).length; }", "f") == 3.0)
    assert(run("function f() { return Array(1, 2).length; }", "f") == 2.0)
  }

  test("runaway scripts hit the step budget; 'new' is rejected") {
    val e = intercept[IllegalStateException](
      run("function f() { while (true) { } }", "f"))
    assert(e.getMessage.contains("step budget"))
    intercept[IllegalArgumentException](MiniJs.load("function f() { return new Date(); }"))
  }

  test("script exceptions surface as errors (reference: runtime rule errors)") {
    val e = intercept[MiniJs.JsError](
      run("function f(x) { if (x < 0) throw 'negative input'; return x; }", "f", -1.0))
    assert(e.getMessage == "negative input")
  }

  // ---- SQL integration ----

  test("registered JS function is callable from SQL (the reference's area example)") {
    JsFunctions.upsert(spark, JsScript("area",
      script = "function area(x, y) { log(\"Hello, World!\"); return x * y; }",
      resultType = "double"))
    import spark.implicits._
    val out = Seq((3.0, 4.0), (5.0, 6.0)).toDF("length", "width")
      .selectExpr("area(length, width) AS a").orderBy("a")
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(12.0, 30.0))
  }

  test("pure scripts keep determinism (usable in join conditions); stateful ones don't") {
    // static purity: functions-only + no Date/log → deterministic
    assert(MiniJs.isPure("function f(x) { return x * 2; }"))
    assert(MiniJs.isPure(
      "function g(x) { var y = x + 1; return y; } function h(x) { return g(x); }"))
    assert(!MiniJs.isPure("function f() { return Date.now(); }"))
    assert(!MiniJs.isPure("function f(x) { log(x); return x; }"))
    assert(!MiniJs.isPure("var n = 0; function f() { n = n + 1; return n; }"))
    // non-local writes: builtin-object fields and sibling function
    // bindings persist across calls, so writing them is stateful
    assert(!MiniJs.isPure("function f(x) { JSON.n = (JSON.n || 0) + 1; return JSON.n; }"))
    assert(!MiniJs.isPure("function g() { return 1; } function f(x) { g = x; return 0; }"))
    // writes to call-local state stay pure (fresh per invocation)
    assert(MiniJs.isPure(
      "function f(x) { var a = [0]; a[0] = x; var i = 0; i++; return a[0] + i; }"))
    assert(!MiniJs.isPure("not valid js ("))

    // a pure script works where Catalyst rejects nondeterministic
    // expressions — e.g. a join condition
    JsFunctions.upsert(spark, JsScript("js_double",
      script = "function js_double(x) { return x * 2; }", resultType = "double"))
    import spark.implicits._
    Seq(1.0, 2.0).toDF("a").createOrReplaceTempView("js_pure_l")
    Seq(2.0, 4.0, 5.0).toDF("b").createOrReplaceTempView("js_pure_r")
    val joined = spark.sql(
      "SELECT a, b FROM js_pure_l JOIN js_pure_r ON js_double(a) = b ORDER BY a")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(joined == Seq((1.0, 2.0), (2.0, 4.0)))

    // a stateful script keeps the nondeterministic guard: its per-call
    // counter state must not be CSE'd/reordered, and Catalyst refuses
    // it in a join condition
    JsFunctions.upsert(spark, JsScript("js_counter",
      script = "var n = 0; function js_counter(x) { n = n + 1; return n; }",
      resultType = "double"))
    val e = intercept[Exception] {
      spark.sql("SELECT a FROM js_pure_l JOIN js_pure_r ON js_counter(a) = b").collect()
    }
    assert(e.getMessage.toLowerCase.contains("non_deterministic"))
  }

  test("aggregate JS function receives the group's values as an array") {
    JsFunctions.upsert(spark, JsScript("js_spread2", isAgg = true, resultType = "double",
      script = """function js_spread2(xs) {
        var mx = xs[0], mn = xs[0];
        for (var x of xs) { if (x > mx) mx = x; if (x < mn) mn = x; }
        return mx - mn;
      }"""))
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 4L), ("b", 7L), ("b", 7L)).toDF("k", "v")
    df.createOrReplaceTempView("js_agg_in")
    val rows = spark.sql("SELECT k, js_spread2(v) AS spread FROM js_agg_in GROUP BY k")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq(("a", 6.0), ("b", 0.0)))
  }

  test("string/struct results and NaN rejection") {
    JsFunctions.upsert(spark, JsScript("js_tag",
      script = "function js_tag(name, n) { return JSON.stringify({ name: name, big: n > 10 }); }"))
    import spark.implicits._
    val r = Seq(("x", 50L)).toDF("name", "n")
      .selectExpr("js_tag(name, n) AS t").first().getString(0)
    assert(r == """{"name":"x","big":true}""")
    JsFunctions.upsert(spark, JsScript("js_nan", resultType = "double",
      script = "function js_nan(x) { return 0 / 0; }"))
    val e = intercept[Exception](
      Seq(1.0).toDF("x").selectExpr("js_nan(x)").collect())
    assert(e.getMessage.contains("NaN") ||
      Option(e.getCause).exists(_.getMessage.contains("NaN")))
  }

  test("scripts ride data export/import like the reference ruleset") {
    JsFunctions.clear()
    val a = new RuleApi(new RuleEngine(spark))
    a.handle("POST", "/udf/javascript",
      """{"id":"exp_js","script":"function exp_js(x) { return x + 1; }","resultType":"double"}""")
    val (_, doc) = a.handle("GET", "/data/export")
    assert(doc.contains("\"exp_js\""))
    JsFunctions.clear()
    val b = new RuleApi(new RuleEngine(spark))
    val (ci, bi) = b.handle("POST", "/data/import", doc)
    assert(ci == 200 && bi.contains("\"scripts\":1"), bi)
    assert(JsFunctions.get("exp_js").nonEmpty)
    JsFunctions.clear()
  }

  test("aggregate JS function rejects groups past the size cap with a clear error") {
    val old = JsFunctions.MaxAggGroupSize
    JsFunctions.MaxAggGroupSize = 10
    try {
      JsFunctions.upsert(spark, JsScript("js_capsum", isAgg = true, resultType = "double",
        script = """function js_capsum(xs) {
          var s = 0;
          for (var x of xs) s += x;
          return s;
        }"""))
      import spark.implicits._
      // a 5-value group passes; a 50-value group trips the guard
      Seq.tabulate(5)(i => ("ok", i.toLong)).toDF("k", "v")
        .createOrReplaceTempView("js_cap_small")
      assert(spark.sql("SELECT js_capsum(v) AS s FROM js_cap_small GROUP BY k")
        .first().getDouble(0) == 10.0)
      Seq.tabulate(50)(i => ("big", i.toLong)).toDF("k", "v")
        .createOrReplaceTempView("js_cap_big")
      val e = intercept[Exception] {
        spark.sql("SELECT js_capsum(v) AS s FROM js_cap_big GROUP BY k").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m => m.contains("exceeds") && m.contains("MaxAggGroupSize")),
        s"expected the group-cap error, got: ${messages(e)}")
    } finally JsFunctions.MaxAggGroupSize = old
  }

  test("udf/javascript REST CRUD mirrors the reference surface") {
    JsFunctions.clear()
    val a = new RuleApi(new RuleEngine(spark))
    val scriptJson =
      """{"id":"rest_js","description":"double it","script":"function rest_js(x) { return x * 2; }","isAgg":false,"resultType":"double"}"""
    val (c1, b1) = a.handle("POST", "/udf/javascript", scriptJson)
    assert(c1 == 201 && b1.contains("rest_js"), b1)
    // duplicate create rejected (Setnx semantics)
    assert(a.handle("POST", "/udf/javascript", scriptJson)._1 != 201)
    val (c2, b2) = a.handle("GET", "/udf/javascript")
    assert(c2 == 200 && b2.contains("\"rest_js\""))
    val (c3, b3) = a.handle("GET", "/udf/javascript/rest_js")
    assert(c3 == 200 && b3.contains("double it"))
    // the registered function works in SQL immediately
    import spark.implicits._
    assert(Seq(21L).toDF("x").selectExpr("rest_js(x) AS y").first().getDouble(0) == 42.0)
    // update changes behavior
    val (c4, _) = a.handle("PUT", "/udf/javascript/rest_js",
      """{"id":"rest_js","script":"function rest_js(x) { return x * 3; }","resultType":"double"}""")
    assert(c4 == 200)
    assert(Seq(10L).toDF("x").selectExpr("rest_js(x) AS y").first().getDouble(0) == 30.0)
    // invalid script rejected like the reference's validate()
    val (c5, b5) = a.handle("POST", "/udf/javascript",
      """{"id":"broken","script":"function other(x) { return x; }"}""")
    assert(c5 >= 400 && b5.contains("cannot find function"), b5)
    // delete: gone from the list, next SQL use errors
    assert(a.handle("DELETE", "/udf/javascript/rest_js")._1 == 200)
    assert(!a.handle("GET", "/udf/javascript")._2.contains("rest_js"))
    intercept[Exception](
      Seq(1L).toDF("x").selectExpr("rest_js(x)").collect())
  }
}
