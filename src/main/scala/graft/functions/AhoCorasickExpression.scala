package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher: ONE pass over the text counts
  * every occurrence (including overlapping ones and occurrences inside
  * other matches) of every dictionary pattern — the way a blocklist /
  * PII-dictionary / keyword-taxonomy scan runs at 100 TB, where the
  * per-pattern alternative multiplies the corpus scan by |dictionary|.
  * The automaton is built once on the driver and ships inside the
  * expression (broadcast-by-closure); matching is O(text + matches)
  * regardless of dictionary size.
  */
object AhoCorasick {
  final class Automaton(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "dictionary patterns must be non-empty")
    // trie over chars; node 0 is the root
    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[Char, Int])
    private val patEnd = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += scala.collection.mutable.HashMap.empty[Char, Int]
          patEnd += Nil
          children.length - 1
        })
      }
      patEnd(node) = pid :: patEnd(node)
    }
    private val fail = new Array[Int](children.length)
    // per-node pattern ids emitted when the node is reached, including
    // everything reachable over the fail chain (precomputed so the
    // match loop never walks fails for output)
    private val out: Array[Array[Int]] = {
      val o = Array.fill(children.length)(Array.empty[Int])
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).values.foreach { v => fail(v) = 0; queue += v }
      o(0) = patEnd(0).toArray
      children(0).values.foreach(v => o(v) = (patEnd(v) ++ o(0).toList).toArray)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).foreach { case (c, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          fail(v) = children(f).get(c).filter(_ != v).getOrElse(0)
          o(v) = (patEnd(v) ++ o(fail(v)).toList).toArray
          queue += v
        }
      }
      o
    }

    /** Per-pattern occurrence counts (start-position semantics:
      * overlapping matches all count) over one left-to-right pass.
      */
    def countAll(text: UTF8String): ArrayData = {
      val s = text.toString
      val counts = new Array[Long](patterns.length)
      var state = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        while (state != 0 && !children(state).contains(c)) state = fail(state)
        state = children(state).getOrElse(c, 0)
        val os = out(state)
        var j = 0
        while (j < os.length) { counts(os(j)) += 1; j += 1 }
        i += 1
      }
      new GenericArrayData(counts)
    }
  }
}

/** `ac_counts(text)`: array of per-pattern occurrence counts for the
  * automaton's dictionary, in dictionary order. Codegen emits a call on
  * the automaton reference (the [[TextEntropy]] static-helper pattern,
  * with the automaton as a referenced object instead of a static).
  */
case class AcCountsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val automaton =
    new AhoCorasick.Automaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ac_counts requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_counts"

  override def nullSafeEval(v: Any): Any =
    automaton.countAll(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$autoRef.countAll($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AcCountsExpr = copy(child = newChild)
}

object AcCountsFn {
  /** Column form, session-registration-free (the GraftSqlApi bridge). */
  def apply(c: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlApi.column(
      AcCountsExpr(org.apache.spark.sql.GraftSqlApi.expr(c), patterns))
}
