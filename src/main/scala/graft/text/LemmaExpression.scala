package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static suffix-detachment rules shared by the interpreted and
  * generated code paths of [[LemmatizeTokens]] (WordNet-morphy-style,
  * public algorithm: wordnet.princeton.edu/documentation/morphy7wn).
  * Kept as a plain object with a UTF8String entry point so the
  * generated Java calls ONE static method per token — no row
  * conversion, no encoder, no closure dispatch.
  */
object LemmaRules {
  private val exceptions: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Seq(
      "men" -> "man", "women" -> "woman", "children" -> "child",
      "feet" -> "foot", "teeth" -> "tooth", "mice" -> "mouse",
      "geese" -> "goose", "better" -> "good", "worse" -> "bad",
      "ran" -> "run", "took" -> "take", "went" -> "go",
      // -ying irregulars are a closed class — a "ying"→"ie" suffix rule
      // would corrupt regular verbs (studying→studie) while its length
      // guards reject exactly these three
      "dying" -> "die", "lying" -> "lie", "tying" -> "tie"
    ).foreach { case (k, v) => m.put(k, v) }
    m
  }

  def lemma(w: String): String = {
    val e = exceptions.get(w)
    if (e != null) e else detach(w)
  }

  def lemmaUtf8(w: UTF8String): UTF8String = {
    val s = w.toString
    val l = lemma(s)
    if (l eq s) w else UTF8String.fromString(l)
  }

  // ----------------------------------------------------- POS-aware path
  /** Wordnet POS classes, as the reference's `get_wordnet_pos` maps
    * treebank tags (lab2.py:102–114): J*→'a', V*→'v', N*→'n', R*→'r',
    * default 'n'.
    */
  final val PosAdj = 'a'
  final val PosVerb = 'v'
  final val PosNoun = 'n'
  final val PosAdv = 'r'

  /** Map a Penn-treebank tag to the wordnet POS — the exact U1 mapping
    * of the reference (lab2.py:102–114).
    */
  def treebankToWordnet(tag: String): Char =
    if (tag.isEmpty) PosNoun
    else tag.charAt(0) match {
      case 'J' => PosAdj
      case 'V' => PosVerb
      case 'N' => PosNoun
      case 'R' => PosAdv
      case _ => PosNoun
    }

  /** Heuristic suffix POS tagger standing in for the reference's NLTK
    * perceptron (not reproducible offline on the JVM — SURVEY §7.4.1):
    * emits treebank-shaped tags so [[treebankToWordnet]] is exercised
    * with the reference's own mapping. Default NN mirrors the
    * reference's noun default. Deliberately does NOT tag -er/-est as
    * adjectives — the suffix is too ambiguous (cluster, paper, water
    * are nouns), so comparative/superlative detachment is reachable
    * only via caller-supplied tags through [[lemmaPos]].
    */
  def heuristicTreebankTag(w: String): String =
    if (w.endsWith("ly")) "RB"
    else if (w.endsWith("ing")) "VBG"
    else if (w.endsWith("ed")) "VBD"
    else if (w.endsWith("ous") || w.endsWith("ful") || w.endsWith("ive") ||
      w.endsWith("ic") || w.endsWith("able") || w.endsWith("ible")) "JJ"
    else "NN"

  /** POS-aware lemma: detachment rules gated by the word's wordnet POS
    * (morphy applies noun rules to nouns, verb rules to verbs, …) —
    * e.g. the noun "building" is NOT stripped to "build" unless tagged
    * as a verb; adjectives get -er/-est handling (reachable with
    * caller-supplied tags — see [[heuristicTreebankTag]]); adverbs pass
    * through (wordnet has no -ly detachment).
    */
  def lemmaPos(w: String, pos: Char): String = {
    val e = exceptions.get(w)
    if (e != null) return e
    pos match {
      case PosNoun => detachNoun(w)
      case PosVerb => detachVerb(w)
      case PosAdj => detachAdj(w)
      case _ => w
    }
  }

  /** Tag-then-lemmatize, the reference's per-token shape
    * (lab2.py:126–129): heuristic tag → wordnet POS → POS-gated rules.
    */
  def lemmaTagged(w: String): String =
    lemmaPos(w, treebankToWordnet(heuristicTreebankTag(w)))

  def lemmaTaggedUtf8(w: UTF8String): UTF8String = {
    val s = w.toString
    val l = lemmaTagged(s)
    if (l eq s) w else UTF8String.fromString(l)
  }

  private def ok(s: String) = s.length >= 2

  /** Porter-style undoubling after -ing/-ed/-er detachment: strip the
    * doubled final consonant (running→run) UNLESS it is l/s/z, which
    * double legitimately in stems (falling→fall, passing→pass,
    * buzzing→buzz).
    */
  private def undouble(stem: String): String =
    if (stem.length >= 3 && stem(stem.length - 1) == stem(stem.length - 2) &&
      !"lsz".contains(stem(stem.length - 1)) && stem(stem.length - 1).isLetter)
      stem.dropRight(1)
    else stem

  private def detachNoun(w: String): String =
    if (w.endsWith("ies") && ok(w.dropRight(3)))       w.dropRight(3) + "y"
    else if (w.endsWith("sses"))                       w.dropRight(2)
    else if (w.endsWith("shes") || w.endsWith("ches")) w.dropRight(2)
    else if (w.endsWith("xes") || w.endsWith("zes"))   w.dropRight(2)
    else if (w.endsWith("ss"))                         w
    else if (w.endsWith("s") && !w.endsWith("us") && !w.endsWith("is") && ok(w.dropRight(1)))
      w.dropRight(1)
    else w

  private def detachVerb(w: String): String =
    if (w.endsWith("ing") && w.length > 5)             undouble(w.dropRight(3))
    else if (w.endsWith("ied") && ok(w.dropRight(3)))  w.dropRight(3) + "y"
    else if (w.endsWith("ed") && w.length > 4)         undouble(w.dropRight(2))
    else if (w.endsWith("s") && !w.endsWith("ss") && !w.endsWith("us") && !w.endsWith("is") && ok(w.dropRight(1)))
      w.dropRight(1) // third-person singular
    else w

  private def detachAdj(w: String): String =
    if (w.endsWith("est") && w.length > 5)             undouble(w.dropRight(3))
    else if (w.endsWith("er") && w.length > 4)         undouble(w.dropRight(2))
    else w

  /** Untagged detachment: the noun → verb → adjective rule chain in the
    * original longest-suffix-first order (first matching arm wins —
    * identical arm ordering to the pre-refactor single function, so
    * [[RuleLemmatizer]] semantics are preserved modulo the undoubling
    * and -ying fixes).
    */
  private def detach(w: String): String = {
    val n = detachNoun(w)
    if (n ne w) n
    else {
      val v = detachVerb(w)
      if (v ne w) v else detachAdj(w)
    }
  }
}

/** Native codegen'd lemmatization of an `array<string>` column — the
  * whole-stage-codegen replacement for the Scala-UDF form (a per-row
  * UDF forces UTF8String→String→Seq encoder round-trips and a closure
  * dispatch per ROW; this expression does one static call per TOKEN
  * and stays inside the generated pipeline, consistent with the repo's
  * HoF findings in SCALE.md). Null tokens and null arrays pass through.
  */
case class LemmatizeTokens(child: Expression, posAware: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lemmatize_tokens requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String =
    if (posAware) "lemmatize_tokens_pos" else "lemmatize_tokens"

  private def one(w: UTF8String): UTF8String =
    if (posAware) LemmaRules.lemmaTaggedUtf8(w) else LemmaRules.lemmaUtf8(w)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) null else one(a.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      val fn = if (posAware) "lemmaTaggedUtf8" else "lemmaUtf8"
      s"""
         |int $n = $a.numElements();
         |UTF8String[] $vals = new UTF8String[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $vals[$i] = $a.isNullAt($i) ? null
         |    : graft.text.LemmaRules.$fn($a.getUTF8String($i));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LemmatizeTokens =
    copy(child = newChild)
}
