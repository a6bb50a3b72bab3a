package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching via the Aho-Corasick automaton
  * (Aho & Corasick 1975, "Efficient string matching") — the
  * blocklist/keyword-tagging primitive of corpus curation: match
  * THOUSANDS of patterns against every document in a single pass per
  * document, instead of one scan per pattern. The automaton builds
  * once on the driver and rides into generated code as a referenced
  * object; matching is case-insensitive over the lowercased text.
  *
  * Counts include overlapping occurrences (every automaton output is
  * reported), which equals non-overlapping substring counts whenever
  * a pattern cannot overlap itself.
  */
final class AcAutomaton(patternsIn: Seq[String]) extends Serializable {
  // fold per-char exactly like the matching loop (NOT locale-default
  // String.toLowerCase — a Turkish-locale JVM would fold 'I'→'ı' on
  // one side only and such patterns would never match)
  val patterns: Array[String] =
    patternsIn.map(p => p.map(Character.toLowerCase)).distinct.sorted.toArray
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")

  // nodes as growable parallel structures; transitions in per-node maps
  private val next = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
  private val fail = new java.util.ArrayList[Integer]()
  private val out = new java.util.ArrayList[Array[Int]]() // pattern ids ending here

  locally {
    def newNode(): Int = {
      next.add(new java.util.HashMap[Character, Integer]())
      fail.add(0)
      out.add(Array.empty)
      next.size - 1
    }
    newNode() // root = 0
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { ch =>
        val t = next.get(s).get(ch)
        s = if (t != null) t.intValue()
        else {
          val n = newNode()
          next.get(s).put(ch, n)
          n
        }
      }
      out.set(s, out.get(s) :+ id)
    }
    // BFS failure links (deterministic: children visited in sorted order)
    val queue = new java.util.ArrayDeque[Integer]()
    import scala.jdk.CollectionConverters._
    next.get(0).entrySet().asScala.toSeq.sortBy(_.getKey.charValue()).foreach { e =>
      fail.set(e.getValue, 0)
      queue.add(e.getValue)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      next.get(u).entrySet().asScala.toSeq.sortBy(_.getKey.charValue()).foreach { e =>
        val (ch, v) = (e.getKey.charValue(), e.getValue.intValue())
        var f = fail.get(u).intValue()
        while (f != 0 && next.get(f).get(ch) == null) f = fail.get(f).intValue()
        val link = next.get(f).get(ch)
        val fv = if (link != null && link.intValue() != v) link.intValue() else 0
        fail.set(v, fv)
        if (out.get(fv).nonEmpty) out.set(v, out.get(v) ++ out.get(fv))
        queue.add(v)
      }
    }
  }

  /** Per-pattern occurrence counts over the lowercased text. */
  def countsOf(text: String): Array[Long] = {
    val res = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = Character.toLowerCase(text.charAt(i))
      var t = next.get(s).get(ch)
      while (t == null && s != 0) {
        s = fail.get(s).intValue()
        t = next.get(s).get(ch)
      }
      s = if (t != null) t.intValue() else 0
      val hits = out.get(s)
      var j = 0
      while (j < hits.length) { res(hits(j)) += 1L; j += 1 }
      i += 1
    }
    res
  }

  /** (total occurrences, sorted distinct matched patterns). */
  def tag(text: String): (Long, Array[String]) = {
    val c = countsOf(text)
    var total = 0L
    val matched = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < c.length) {
      total += c(i)
      if (c(i) > 0) matched += patterns(i)
      i += 1
    }
    (total, matched.toArray) // patterns array is sorted → matched is too
  }
}

/** struct(n_hits BIGINT, matched ARRAY<STRING>) per document. */
case class AcTagExpr(child: Expression, ac: AcAutomaton)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("matched", ArrayType(StringType, containsNull = false), nullable = false)))
  override def prettyName: String = "keyword_tag"
  override protected def nullSafeEval(input: Any): Any =
    AhoCorasickBridge.tagRow(input.asInstanceOf[UTF8String].toString, ac)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AhoCorasickBridge.tagRow($c.toString(), $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): AcTagExpr =
    copy(child = newChild)
}

object AhoCorasickBridge {
  def tagRow(text: String, ac: AcAutomaton): org.apache.spark.sql.catalyst.InternalRow = {
    val (total, matched) = ac.tag(text)
    org.apache.spark.sql.catalyst.InternalRow(total,
      new GenericArrayData(matched.map(m => UTF8String.fromString(m): Any)))
  }
}

object AcFunctions {
  def keyword_tag(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcTagExpr(ColumnBridge.expression(text),
      new AcAutomaton(patterns)))
}
