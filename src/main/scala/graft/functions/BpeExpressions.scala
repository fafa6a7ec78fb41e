package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match BPE encoding of a text against a fixed piece
  * vocabulary, as ONE native Catalyst expression with whole-stage
  * codegen.
  *
  * Semantics (replayable in SQL, which is what makes the contract
  * query oracle-checkable): the input is split on single spaces,
  * empty words are skipped, and each word is consumed left to right —
  * at every position the LONGEST vocabulary piece matching there is
  * emitted, and when no piece matches, the single character at that
  * position is emitted as its own piece (the byte-fallback rule every
  * deployed BPE tokenizer carries). Matches never cross a word
  * boundary. This is the greedy segmentation used by SentencePiece-
  * style BPE at inference time; merge-rank order is baked into the
  * vocabulary (a merges list and its vocab are equivalent for
  * encoding: every merge product is a piece).
  *
  * The vocabulary ships with the expression like a literal (it is
  * part of the plan, broadcast to executors inside the task binary —
  * the broadcast-vocab pattern), so lookups are driver-free. Matching
  * is per-first-character buckets sorted by length descending: vocab
  * sizes are 10^4-10^5 in practice, buckets are tiny, and each probe
  * is a bounded startsWith — no per-row hashing or allocation beyond
  * the output array.
  *
  * The expression expects already-lowercased input (pass
  * `lower(col)`), keeping case folding in Spark's own `lower` exactly
  * like [[TextFunctions.tokens]] does, so engine-vs-oracle folding
  * parity is concentrated in one well-tested place.
  */
case class BpeEncodePieces(child: Expression, pieces: Seq[String],
    markWords: Boolean = false)
    extends UnaryExpression {
  require(pieces.nonEmpty && pieces.forall(_.length >= 2),
    "vocabulary must be multi-char pieces (single chars are the " +
      "implicit fallback)")
  require(!markWords || pieces.forall(!_.contains(WordMark.value)),
    s"pieces must not contain the word marker '${WordMark.value}'")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_pieces"

  // first char -> candidate pieces, longest first (two same-length
  // pieces can never both match one position, so the length-desc scan
  // is a total decision rule; the lexicographic second key only makes
  // the array order deterministic)
  @transient private lazy val byFirst: Map[Char, Array[String]] =
    pieces.distinct.groupBy(_.charAt(0)).map { case (c, ps) =>
      c -> ps.sortBy(p => (-p.length, p)).toArray
    }

  /** Shared by interpreted eval and the generated code (referenced via
    * addReferenceObj — the loop is data-dependent, so a method call on
    * the expression object beats inlining a vocab-sized code blob).
    */
  def encode(s: UTF8String): GenericArrayData = {
    val text = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val len = text.length
    var start = 0
    while (start <= len) {
      val sp = text.indexOf(' ', start)
      val end = if (sp < 0) len else sp
      var pos = start
      var firstInWord = true
      while (pos < end) {
        var matched: String = null
        val cands = byFirst.getOrElse(text.charAt(pos), null)
        if (cands != null) {
          var ci = 0
          while (ci < cands.length && matched == null) {
            val p = cands(ci)
            if (pos + p.length <= end && text.startsWith(p, pos))
              matched = p
            ci += 1
          }
        }
        val piece =
          if (matched == null) {
            // whole-codepoint fallback: stepping charAt-wise would
            // split a non-BMP character into two lone-surrogate pieces
            // (malformed UTF8 and a divergence from the per-codepoint
            // SQL oracle)
            val n = Character.charCount(text.codePointAt(pos))
            val p = text.substring(pos, math.min(pos + n, end))
            pos += n
            p
          } else {
            pos += matched.length
            matched
          }
        // SentencePiece-style word marker on each word's first piece
        // makes the encoding invertible: decode = concat + marker→space
        out += UTF8String.fromString(
          if (markWords && firstInWord) WordMark.value + piece else piece)
        firstInWord = false
      }
      start = end + 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncodePieces].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** The SentencePiece word-boundary marker (U+2581 LOWER ONE EIGHTH
  * BLOCK) — prefixes each word's first piece when `markWords` is on,
  * making the piece stream invertible.
  */
object WordMark {
  val value: String = "▁"
  override def toString: String = value
}

object BpeExpressions {
  /** Column entry point: greedy longest-match BPE pieces of an
    * (already lowercased) text column. With `markWords` each word's
    * first piece is prefixed by [[WordMark]], making
    * [[bpeDecodePieces]] an exact inverse up to whitespace
    * normalization (multiple spaces collapse — empty words are
    * skipped by the encoder).
    */
  def bpeEncodePieces(text: Column, pieces: Seq[String],
      markWords: Boolean = false): Column =
    ColumnBridge.column(BpeEncodePieces(
      ColumnBridge.expression(text), pieces, markWords))

  /** Inverse of a `markWords = true` encoding: concatenate the
    * pieces, turn each word marker back into a space, trim the
    * leading one. Plain codegen'd string functions — no custom
    * expression needed for the decode direction.
    */
  def bpeDecodePieces(piecesCol: Column): Column = {
    import org.apache.spark.sql.functions._
    ltrim(translate(array_join(piecesCol, ""), WordMark.value, " "))
  }
}
