package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Char-trigram language-ID model — the public CLD/fastText approach
  * (character n-gram profiles scored by log-likelihood), distilled to a
  * driver-held model exactly like the k-means centroids / BPE merge
  * table: profiles are built ONCE from built-in seed prose at class-load
  * time, shipped to executors inside the expression, and scoring is a
  * single pass over the document's normalized chars.
  *
  * This is q36's v2 for what the stopword heuristic cannot do: TOKENLESS
  * and SHORT text. Stopword profiles need whole function words — a
  * tweet-length fragment or an agglutinated compound may contain none —
  * while char trigrams accumulate evidence from every 3-char window.
  * (Non-Latin scripts are decided upstream by script ranges — see
  * `TextAnalysis.predictLang` — so the trigram profiles only carry the
  * Latin languages they can actually separate.)
  *
  * Determinism: profile log-probs are integer MICRO-NATS (the q156 ln
  * discipline) with add-one smoothing over the UNION gram vocabulary, so
  * scores are exact integer sums; argmax ties break by fixed profile
  * order. Scoring caps at [[LangIdModel.MaxChars]] normalized chars —
  * language is decided in the first kilobyte; an adversarially long doc
  * must not make the projection quadratic-ish.
  */
final class LangIdModel(
    val langs: Array[String],
    gramKeys: Array[Array[String]],
    gramVals: Array[Array[Long]],
    defaults: Array[Long]) extends Serializable {

  @transient private lazy val maps: Array[java.util.HashMap[String, java.lang.Long]] =
    gramKeys.indices.map { i =>
      val m = new java.util.HashMap[String, java.lang.Long](gramKeys(i).length * 2)
      var j = 0
      while (j < gramKeys(i).length) { m.put(gramKeys(i)(j), gramVals(i)(j)); j += 1 }
      m
    }.toArray

  /** Lower-case, letters kept, runs of non-letters collapsed to one
    * space, single space padding — the profile-build normalization,
    * shared verbatim so train and serve can't drift. */
  def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(math.min(text.length, LangIdModel.MaxChars) + 2)
    sb.append(' ')
    var i = 0
    var lastSpace = true
    while (i < text.length && sb.length() < LangIdModel.MaxChars) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) { sb.append(Character.toLowerCase(c)); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    if (!lastSpace) sb.append(' ')
    sb.toString
  }

  /** argmax_lang Σ_trigram logP(g | lang); `und` when no trigram exists. */
  def predict(text: UTF8String): UTF8String = {
    val s = normalize(text.toString)
    if (s.length < 3) return UTF8String.fromString("und")
    val scores = new Array[Long](langs.length)
    var i = 0
    while (i + 3 <= s.length) {
      val g = s.substring(i, i + 3)
      var l = 0
      while (l < langs.length) {
        val v = maps(l).get(g)
        scores(l) += (if (v == null) defaults(l) else v.longValue())
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < langs.length) {
      if (scores(l) > scores(best)) best = l // strict: ties keep first
      l += 1
    }
    UTF8String.fromString(langs(best))
  }
}

object LangIdModel {
  final val MaxChars = 2000

  /** Build a model from (lang, seed prose) pairs: add-one smoothing over
    * the union trigram vocabulary, log-probs in integer micro-nats. */
  def fromSeeds(seeds: Seq[(String, String)]): LangIdModel = {
    val probe = new LangIdModel(Array.empty, Array.empty, Array.empty, Array.empty)
    val counts = seeds.map { case (lang, text) =>
      val s = probe.normalize(text)
      val m = scala.collection.mutable.Map.empty[String, Long]
      var i = 0
      while (i + 3 <= s.length) {
        val g = s.substring(i, i + 3)
        m(g) = m.getOrElse(g, 0L) + 1L
        i += 1
      }
      lang -> m.toMap
    }
    val vocab = counts.flatMap(_._2.keys).distinct.sorted
    val v = vocab.length
    val langs = counts.map(_._1).toArray
    val keys = new Array[Array[String]](langs.length)
    val vals = new Array[Array[Long]](langs.length)
    val defaults = new Array[Long](langs.length)
    counts.zipWithIndex.foreach { case ((_, m), i) =>
      val n = m.values.sum
      defaults(i) = math.round(1e6 * math.log(1.0 / (n + v)))
      val ks = m.keys.toArray.sorted
      keys(i) = ks
      vals(i) = ks.map(g => math.round(1e6 * math.log((m(g) + 1.0) / (n + v))))
    }
    new LangIdModel(langs, keys, vals, defaults)
  }

  /** The built-in Latin-script profiles (en/de/es/fr): a paragraph of
    * ordinary prose per language, function-word rich — the signal char
    * trigrams key on. A deployment retrains [[fromSeeds]] on real
    * per-language corpora; the plumbing is identical.
    */
  lazy val Default: LangIdModel = fromSeeds(Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it runs " +
      "away because the day is long and the water is cold with many things " +
      "that people would like to have when they are at home and the children " +
      "play in the garden while the old man reads his book about the history " +
      "of the world and everything that has happened before this morning"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und dann " +
      "läuft er weg weil der tag lang ist und das wasser kalt ist mit vielen " +
      "dingen die die menschen gerne haben wenn sie zu hause sind und die " +
      "kinder spielen im garten während der alte mann sein buch über die " +
      "geschichte der welt liest und alles was vorher an diesem morgen geschehen ist"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y luego se " +
      "escapa porque el día es largo y el agua está fría con muchas cosas que " +
      "la gente quisiera tener cuando está en casa y los niños juegan en el " +
      "jardín mientras el viejo hombre lee su libro sobre la historia del " +
      "mundo y todo lo que ha pasado antes de esta mañana"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et puis " +
      "il s'enfuit parce que la journée est longue et l'eau est froide avec " +
      "beaucoup de choses que les gens aimeraient avoir quand ils sont à la " +
      "maison et les enfants jouent dans le jardin pendant que le vieil homme " +
      "lit son livre sur l'histoire du monde et tout ce qui s'est passé avant ce matin")))
}

object LangIdNgram {
  /** DataFrame-API entry: predicted Latin-script language for a text
    * column under the built-in profiles. */
  def predict(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(LangIdNgram(ColumnBridge.expression(c), LangIdModel.Default))
  }
}

/** `graft_langid_ngram(text)` — native expression scoring char-trigram
  * profiles (see [[LangIdModel]]); codegen'd via an addReferenceObj model
  * call so it rides whole-stage codegen with no UDF boxing.
  */
case class LangIdNgram(child: Expression, model: LangIdModel)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_langid_ngram expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    model.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdModel", model, "graft.functions.LangIdModel")
    defineCodeGen(ctx, ev, c => s"$ref.predict($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdNgram =
    copy(child = newChild)
}
