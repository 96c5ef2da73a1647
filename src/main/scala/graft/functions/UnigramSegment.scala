package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a trained unigram language
  * model (the decode half of the SentencePiece unigram tokenizer,
  * Kudo 2018, arXiv 1804.10959): pick the piece sequence maximizing the
  * sum of piece log-probabilities. `pieces` are (piece, logProb) from
  * [[graft.operators.Training.unigramTrain]]; characters outside the
  * vocabulary fall back to single-char pieces at `unkScore` (coverage
  * is total — segmentation never fails).
  *
  * Ties break toward the LONGER last piece (the candidate scan visits
  * longer pieces first and later candidates must be strictly better),
  * so the output is deterministic even when two paths score equal.
  *
  * Native for the usual reason: per-word dynamic programming is a hot
  * row-local loop; a HOF lattice would run interpreted per word. The
  * trained model rides the plan as constants ([[CodegenContext
  * .addReferenceObj]]), is built into a hash map once per instance, and
  * the generated code calls one static scan — encoding a corpus is a
  * shuffle-free map stage exactly like BPE's [[MergePair]] chain.
  */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Double)],
    unkScore: Double) extends UnaryExpression {

  require(pieces.nonEmpty, "unigram_segment: empty vocabulary")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires string, got ${other.catalogString}")
  }

  @transient private lazy val model =
    UnigramSegmentEval.build(pieces.map(_._1).toArray,
      pieces.map(_._2).toArray, unkScore)

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegmentEval.segment(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val piecesRef = ctx.addReferenceObj("unigramPieces",
      pieces.map(_._1).toArray, "java.lang.String[]")
    val scoresRef = ctx.addReferenceObj("unigramScores",
      pieces.map(_._2).toArray, "double[]")
    // the unk score rides as a reference too: interpolating a double
    // into Java source breaks on non-literal values (-Infinity → the
    // unparseable token "-InfinityD")
    val unkRef = ctx.addReferenceObj("unigramUnk",
      java.lang.Double.valueOf(unkScore), "java.lang.Double")
    val modelVar = ctx.addMutableState(
      "graft.functions.UnigramSegmentEval.Model", "graftUnigramModel",
      v => s"$v = graft.functions.UnigramSegmentEval.build(" +
        s"$piecesRef, $scoresRef, $unkRef.doubleValue());")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegmentEval.segment($c, $modelVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object UnigramSegmentEval {

  /** Trained model in scan form: piece → log-prob map plus the longest
    * piece length (bounds the DP's inner candidate scan). */
  final class Model(val scores: java.util.HashMap[String, java.lang.Double],
    val maxLen: Int, val unkScore: Double)

  def build(pieces: Array[String], scores: Array[Double],
      unkScore: Double): Model = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var maxLen = 1
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Double.valueOf(scores(i)))
      if (pieces(i).length > maxLen) maxLen = pieces(i).length
      i += 1
    }
    new Model(m, maxLen, unkScore)
  }

  /** Viterbi over char positions: best(i) = best score of a segmentation
    * of s[0, i); candidates at end i scan start j from far (long piece)
    * to near, strictly-better-wins. Unknown single chars score
    * `unkScore`. Returns the piece array (empty input → empty array). */
  def segment(input: UTF8String, model: Model): GenericArrayData = {
    val s = input.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the winning last piece
    java.util.Arrays.fill(best, 1, n + 1, Double.NegativeInfinity)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - model.maxLen)
      var found = false
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val sc = model.scores.get(s.substring(j, i))
          if (sc != null) {
            val cand = best(j) + sc.doubleValue()
            if (cand > best(i)) { best(i) = cand; back(i) = j }
            found = true
          }
        }
        j += 1
      }
      // single-char fallback keeps coverage total when the char (or
      // every reachable piece ending here) is out of vocabulary
      if (!found || best(i) == Double.NegativeInfinity) {
        val cand = best(i - 1) + model.unkScore
        if (cand > best(i)) { best(i) = cand; back(i) = i - 1 }
      }
      i += 1
    }
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p = back(p) }
    val out = new Array[Any](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) {
      out(k) = UTF8String.fromString(s.substring(back(p), p))
      k -= 1
      p = back(p)
    }
    new GenericArrayData(out)
  }
}
