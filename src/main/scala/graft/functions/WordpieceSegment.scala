package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first segmentation of a word under a WordPiece
  * vocabulary — the BERT tokenizer's encode rule (Schuster & Nakajima
  * 2012; Devlin et al. 2018 §A wordpiece tokenization): at each position
  * take the LONGEST vocabulary piece that matches, where position 0
  * matches plain pieces and every later position matches continuation
  * pieces (the `##`-prefixed entries). A word with no match at some
  * position collapses to the single `unkToken` — WordPiece, unlike the
  * unigram model's single-char fallback, is deliberately partial.
  *
  * Native for the [[UnigramSegment]] reason: the per-word match loop is
  * hot and row-local; the vocabulary rides the plan as constants
  * ([[CodegenContext.addReferenceObj]]), splits into initial/continuation
  * hash sets once per instance, and encoding a corpus stays one
  * shuffle-free whole-stage-codegen map stage.
  */
case class WordpieceSegment(child: Expression, vocab: Seq[String],
    unkToken: String) extends UnaryExpression {

  require(vocab.nonEmpty, "wordpiece_segment: empty vocabulary")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_segment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment requires string, got ${other.catalogString}")
  }

  @transient private lazy val model =
    WordpieceSegmentEval.build(vocab.toArray, unkToken)

  override protected def nullSafeEval(input: Any): Any =
    WordpieceSegmentEval.segment(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wordpieceVocab", vocab.toArray,
      "java.lang.String[]")
    val unkRef = ctx.addReferenceObj("wordpieceUnk", unkToken,
      "java.lang.String")
    val modelVar = ctx.addMutableState(
      "graft.functions.WordpieceSegmentEval.Model", "graftWordpieceModel",
      v => s"$v = graft.functions.WordpieceSegmentEval.build(" +
        s"$vocabRef, $unkRef);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordpieceSegmentEval.segment($c, $modelVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object WordpieceSegmentEval {

  /** Vocabulary in scan form: initial pieces and continuation pieces
    * (stored STRIPPED of the `##` marker — lookups never allocate) in
    * separate sets, with each set's longest piece length bounding the
    * greedy scan. */
  final class Model(val initial: java.util.HashSet[String],
    val cont: java.util.HashSet[String], val maxInit: Int,
    val maxCont: Int, val unk: UTF8String)

  def build(vocab: Array[String], unkToken: String): Model = {
    val initial = new java.util.HashSet[String](vocab.length * 2)
    val cont = new java.util.HashSet[String](vocab.length * 2)
    var maxInit = 1
    var maxCont = 1
    var i = 0
    while (i < vocab.length) {
      val p = vocab(i)
      if (p.startsWith("##")) {
        val raw = p.substring(2)
        require(raw.nonEmpty, "wordpiece_segment: bare '##' in vocabulary")
        cont.add(raw)
        if (raw.length > maxCont) maxCont = raw.length
      } else {
        require(p.nonEmpty, "wordpiece_segment: empty piece in vocabulary")
        initial.add(p)
        if (p.length > maxInit) maxInit = p.length
      }
      i += 1
    }
    new Model(initial, cont, maxInit, maxCont,
      UTF8String.fromString(unkToken))
  }

  /** The greedy walk: longest match at each position, `##`-prefixed
    * output for continuation positions, whole-word unk on any failure.
    * Empty input → empty array. */
  def segment(input: UTF8String, model: Model): GenericArrayData = {
    val s = input.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = 0
    while (pos < n) {
      val set = if (pos == 0) model.initial else model.cont
      val maxLen = if (pos == 0) model.maxInit else model.maxCont
      var l = math.min(maxLen, n - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (set.contains(s.substring(pos, pos + l))) hit = l
        else l -= 1
      }
      if (hit < 0) return new GenericArrayData(Array[Any](model.unk))
      val piece = s.substring(pos, pos + hit)
      out += UTF8String.fromString(if (pos == 0) piece else "##" + piece)
      pos += hit
    }
    new GenericArrayData(out.toArray)
  }
}
