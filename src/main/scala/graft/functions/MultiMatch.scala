package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search: the DISTINCT blocklist terms that
  * occur in `child`, returned lexicographically sorted (deterministic —
  * oracle-comparable). Matching is case-insensitive substring (the t24
  * banned-terms semantics).
  *
  * Native for a sharper reason than the usual HOF-vs-codegen one: the
  * composed form — one `contains` per term — is O(terms × text) per
  * row. A production blocklist (policy phrase lists, contaminated-site
  * markers, PII trigger phrases) carries thousands of terms, and the
  * scan touches every document of the corpus; this expression runs the
  * classic Aho-Corasick automaton (Aho & Corasick 1975, CACM 18(6)) —
  * goto/failure/output functions built once per executor — so the scan
  * is one O(text) pass regardless of blocklist size. NULL text yields
  * NULL.
  */
case class MultiMatch(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "multi_match requires at least one term")
  require(terms.forall(_.nonEmpty), "multi_match terms must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_match"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_match requires string, got ${other.catalogString}")
  }

  @transient private lazy val ac = MultiMatchEval.build(terms.toArray)

  override protected def nullSafeEval(input: Any): Any =
    MultiMatchEval.matches(input.asInstanceOf[UTF8String], ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("blocklistTerms", terms.toArray,
      "java.lang.String[]")
    val acVar = ctx.addMutableState("graft.functions.MultiMatchEval.Automaton",
      "graftMultiMatchAc",
      v => s"$v = graft.functions.MultiMatchEval.build($termsRef);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MultiMatchEval.matches($c, $acVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object MultiMatchEval {

  /** Aho-Corasick automaton over lowercased terms. States are trie
    * nodes; `fail` is the longest proper suffix that is also a trie
    * prefix; `out` chains every term ending at (or reachable by failure
    * from) a state. Built once per executor and shared across rows. */
  final class Automaton(termsIn: Array[String]) extends Serializable {
    /** Lexicographically sorted lowercased distinct terms — the output
      * order contract. */
    val sorted: Array[String] =
      termsIn.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.sorted
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(newNode())
    private val termAt = scala.collection.mutable.ArrayBuffer(-1)
    private def newNode() = new java.util.HashMap[Character, Integer]()

    // trie
    for (t <- sorted.indices) {
      var s = 0
      for (ch <- sorted(t)) {
        val next = gotoMaps(s).get(ch)
        if (next == null) {
          gotoMaps += newNode(); termAt += -1
          gotoMaps(s).put(ch, gotoMaps.length - 1)
          s = gotoMaps.length - 1
        } else s = next
      }
      termAt(s) = t
    }

    val n: Int = gotoMaps.length
    val fail: Array[Int] = new Array[Int](n)
    /** Terms ending at each state, failure chain pre-flattened: the
      * state's own term (if any) plus outLink to the next suffix state
      * with output — match time follows outLink, not fail. */
    val term: Array[Int] = termAt.toArray
    val outLink: Array[Int] = Array.fill(n)(-1)
    val gotos: Array[java.util.HashMap[Character, Integer]] = gotoMaps.toArray

    // BFS failure links
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      gotos(0).forEach((_, v) => { fail(v.intValue()) = 0; queue.add(v) })
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        gotos(s).forEach { (ch, v) =>
          val vi = v.intValue()
          var f = fail(s)
          while (f != 0 && !gotos(f).containsKey(ch)) f = fail(f)
          val t = gotos(f).get(ch)
          // the self-guard covers depth-1 states, whose root transition
          // is the state itself
          fail(vi) = if (t != null && t.intValue() != vi) t.intValue() else 0
          outLink(vi) =
            if (term(fail(vi)) >= 0) fail(vi)
            else outLink(fail(vi))
          queue.add(v)
        }
      }
    }

    /** One transition with failure-following. */
    def step(state: Int, ch: Char): Int = {
      var s = state
      var t = gotos(s).get(ch)
      while (t == null && s != 0) { s = fail(s); t = gotos(s).get(ch) }
      if (t == null) 0 else t.intValue()
    }
  }

  def build(terms: Array[String]): Automaton = new Automaton(terms)

  def matches(text: UTF8String, ac: Automaton): GenericArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val hit = new Array[Boolean](ac.sorted.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = ac.step(state, s.charAt(i))
      var o = if (ac.term(state) >= 0) state else ac.outLink(state)
      while (o >= 0) { hit(ac.term(o)) = true; o = ac.outLink(o) }
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    var t = 0
    while (t < hit.length) {
      if (hit(t)) out.add(UTF8String.fromString(ac.sorted(t)))
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}
