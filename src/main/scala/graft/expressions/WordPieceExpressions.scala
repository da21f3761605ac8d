package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece encode as a native codegen
  * expression — the BERT-family counterpart of [[BpeTokenize]] (Wu et al.
  * 2016's wordpiece segmenter as popularized by Devlin et al. 2018).
  *
  * The vocabulary is MODEL DATA like the BPE merge table: two piece sets
  * (word-initial and '##'-continuation), derived from the corpus by
  * graft.llm.Tokenize.trainWordPiece and carried into the expression as a
  * reference object. Encoding a word walks left to right, at each position
  * taking the LONGEST vocabulary piece that matches (word-initial set at
  * position 0, continuation set after), emitting continuations with the
  * classic '##' mark. Both sets contain every single character of the
  * corpus as fallback, so the encode is total (no [UNK] path) and the
  * DuckDB oracle can replay it exactly as a recursive CTE taking one
  * longest match per step. One row in, one row out, no shuffle — the
  * projection stays inside whole-stage codegen via `doGenCode`.
  */
final class WordPieceModel(val initial: Array[String],
    val cont: Array[String]) extends Serializable {
  @transient lazy val initialSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](initial.length * 2)
    initial.foreach(s.add); s
  }
  @transient lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](cont.length * 2)
    cont.foreach(s.add); s
  }
  @transient lazy val maxLen: Int =
    (initial.iterator ++ cont.iterator).map(_.length).foldLeft(1)(_ max _)
}

object WordPieceSupport {

  /** Encode one word, appending pieces to `sb` ('|'-separated,
    * continuations marked '##'). Greedy longest-match; if no piece matches
    * (a character outside the training corpus), the single character is
    * emitted as its own piece — total on any input, same as the oracle's
    * guaranteed char-fallback join. */
  def encodeWord(word: String, sb: java.lang.StringBuilder,
      model: WordPieceModel): Unit = {
    val n = word.length
    var pos = 0
    var first = true
    while (pos < n) {
      val set = if (pos == 0) model.initialSet else model.contSet
      var l = math.min(model.maxLen, n - pos)
      var piece: String = null
      while (piece == null && l >= 1) {
        val cand = word.substring(pos, pos + l)
        if (set.contains(cand)) piece = cand else l -= 1
      }
      if (piece == null) { piece = word.substring(pos, pos + 1); l = 1 }
      if (!first) sb.append('|')
      if (pos > 0) sb.append("##")
      sb.append(piece)
      first = false
      pos += l
    }
  }

  /** Whole-document encode: words are the non-empty runs between single
    * spaces (the corpus contract shared with BpeSupport.tokenizeJoined),
    * pieces joined by '|' within a word, words joined by ' '. */
  def tokenizeJoined(text: UTF8String, model: WordPieceModel): UTF8String = {
    val s = text.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n * 2)
    var firstWord = true
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        if (!firstWord) sb.append(' ')
        firstWord = false
        encodeWord(s.substring(i, j), sb, model)
        i = j
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

object ViterbiSupport {

  /** Min-token (Viterbi) segmentation of one word over the SAME positional
    * inventory greedy WordPiece uses — the unigram-LM decode under a
    * uniform piece prior (maximizing Σ log p over equiprobable pieces ==
    * minimizing the piece count; Kudo 2018's segmenter with the EM-trained
    * probabilities flattened). Backward DP best(i) = min pieces to encode
    * the suffix at i, then a forward walk emitting at every position the
    * LONGEST piece still on a shortest path — the deterministic tie rule
    * (distinct pieces of equal length cannot both match at one position,
    * so (count, −length) has a unique argmin) that the DuckDB oracle
    * replays verbatim. Char fallback mirrors greedy's: an off-corpus
    * character costs 1 + best(i+1) in the DP and is emitted as itself, so
    * the encode stays total and the two segmenters stay comparable on any
    * input. */
  def encodeWord(word: String, sb: java.lang.StringBuilder,
      model: WordPieceModel): Unit = {
    val n = word.length
    val best = new Array[Int](n + 1)
    var i = n - 1
    while (i >= 0) {
      val set = if (i == 0) model.initialSet else model.contSet
      val maxL = math.min(model.maxLen, n - i)
      var m = Int.MaxValue
      var l = 1
      while (l <= maxL) {
        if (set.contains(word.substring(i, i + l))) {
          val c = 1 + best(i + l)
          if (c < m) m = c
        }
        l += 1
      }
      best(i) = if (m == Int.MaxValue) 1 + best(i + 1) else m
      i -= 1
    }
    var pos = 0
    var first = true
    while (pos < n) {
      val set = if (pos == 0) model.initialSet else model.contSet
      var l = math.min(model.maxLen, n - pos)
      var piece: String = null
      while (piece == null && l >= 1) {
        val cand = word.substring(pos, pos + l)
        if (set.contains(cand) && 1 + best(pos + l) == best(pos)) piece = cand
        else l -= 1
      }
      if (piece == null) { piece = word.substring(pos, pos + 1); l = 1 }
      if (!first) sb.append('|')
      if (pos > 0) sb.append("##")
      sb.append(piece)
      first = false
      pos += l
    }
  }

  /** Whole-document encode — identical word/join contract to
    * [[WordPieceSupport.tokenizeJoined]] so the two token streams are
    * directly comparable row by row. */
  def tokenizeJoined(text: UTF8String, model: WordPieceModel): UTF8String = {
    val s = text.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n * 2)
    var firstWord = true
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        if (!firstWord) sb.append(' ')
        firstWord = false
        encodeWord(s.substring(i, j), sb, model)
        i = j
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** graft_viterbi_wp(string) → string: min-token Viterbi segmentation over
  * the frozen WordPiece inventory, same output format as
  * [[WordPieceTokenize]] — the optimal decode whose gap to the greedy
  * encode is exactly the greedy approximation loss. */
case class ViterbiTokenize(child: Expression,
    initial: Seq[String], cont: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_viterbi_wp"

  @transient private lazy val model =
    new WordPieceModel(initial.toArray, cont.toArray)

  override protected def nullSafeEval(input: Any): Any =
    ViterbiSupport.tokenizeJoined(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model,
      classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ViterbiSupport$$.MODULE$$.tokenizeJoined($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiTokenize =
    copy(child = newChild)
}

/** graft_wordpiece(string) → string: per-word WordPiece pieces joined by
  * '|' ('##'-marked continuations), words joined by ' '. The vocabulary
  * is frozen into the expression. */
case class WordPieceTokenize(child: Expression,
    initial: Seq[String], cont: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wordpiece"

  @transient private lazy val model =
    new WordPieceModel(initial.toArray, cont.toArray)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceSupport.tokenizeJoined(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model,
      classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordPieceSupport$$.MODULE$$.tokenizeJoined($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokenize =
    copy(child = newChild)
}
