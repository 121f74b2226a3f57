package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** q152 front-door property spec on PLANTED markup — the driver corpus is
  * already-clean prose, so the extraction/lane behavior is pinned here:
  * tag stripping, script/style/comment content removal, entity decoding,
  * link-density quarantine, and plain-text passthrough.
  */
class MarkupExtractSpec extends AnyFunSuite {
  import TestSpark._

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, String, Long, Long)] =
    TextAnalysis.markupExtract(spark.createDataFrame(docs).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lane"), r.getAs[String]("clean_text"),
          r.getAs[Long]("link_bp"), r.getAs[Long]("n_tags"))))
      .toMap

  test("q152 article extraction: tags stripped, script/style/comment content dropped") {
    val html = """<html><head><title>Quarterly report</title>
      |<style>p { color: red }</style>
      |<script type="text/javascript">var tracker = "SHOULD_NOT_APPEAR";</script>
      |</head><body><!-- nav boilerplate SHOULD_NOT_APPEAR -->
      |<h1>Breaking news</h1>
      |<p>The first paragraph of the real article body, long enough to pass
      |the empty gate.</p><a href="/src">one source link</a></body></html>""".stripMargin
    val out = run(Seq(1L -> html))(1L)
    assert(out._1 == "clean", s"lane was ${out._1}")
    assert(!out._2.contains("SHOULD_NOT_APPEAR"), "script/comment content must be dropped")
    assert(!out._2.contains("color"), "style content must be dropped")
    assert(!out._2.contains("<") && !out._2.contains(">"), "no tags survive")
    assert(out._2.contains("Breaking news") &&
      out._2.contains("The first paragraph of the real article body"))
    assert(out._2.contains("Quarterly report"), "title text is visible text")
    assert(out._4 > 0, "tag count recorded")
  }

  test("q152 link-farm page quarantined by anchor density; sparse-link article is not") {
    val nav = "<ul>" + (1 to 8).map(i =>
      s"""<li><a href="/p$i">Navigation item number $i</a></li>""").mkString + "</ul>"
    val article = """<p>A genuine article paragraph with a substantial amount of
      |running prose around it so the anchor share stays small.</p>
      |<a href="/x">tiny link</a>""".stripMargin
    val out = run(Seq(1L -> nav, 2L -> article))
    assert(out(1L)._1 == "quarantine_boilerplate", s"nav lane ${out(1L)._1}, link_bp ${out(1L)._3}")
    assert(out(1L)._3 > 3000, "anchor text dominates a nav page")
    assert(out(2L)._1 == "clean" && out(2L)._3 < 3000)
  }

  test("q152 script-only page lands in quarantine_empty") {
    val page = """<html><body><script>for (var i = 0; i < 100; i++) { work(i); }
      |</script><p>ok</p></body></html>""".stripMargin
    val out = run(Seq(1L -> page))(1L)
    assert(out._1 == "quarantine_empty", s"lane ${out._1}: '${out._2}'")
  }

  test("q152 plain text passes through untouched on the not_markup lane") {
    val txt = "just ordinary prose with no angle brackets at all"
    val out = run(Seq(1L -> txt))(1L)
    assert(out._1 == "not_markup" && out._2 == txt && out._4 == 0L)
  }

  test("q152 entities decode once, &amp; last (no double decode)") {
    val page = """<p>Tom &amp; Jerry &lt;3 &quot;quotes&quot; it&#39;s
      |a&nbsp;space and literal &amp;lt; stays as ampersand-l-t</p>
      |<p>padding so the clean text clears the empty-lane threshold</p>""".stripMargin
    val out = run(Seq(1L -> page))(1L)
    assert(out._1 == "clean")
    assert(out._2.contains("""Tom & Jerry <3 "quotes" it's a space"""), out._2)
    assert(out._2.contains("&lt;"), "&amp;lt; must decode to the four chars &lt; — not to <")
  }

  test("q152 over the sf corpus: every doc routed, prose corpus is all not_markup") {
    val df = TextAnalysis.markupExtract(Tables.documents(spark, sf))
    val lanes = df.groupBy("lane").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lanes.values.sum == Tables.documents(spark, sf).count())
    assert(lanes.keySet == Set("not_markup"), s"driver corpus is clean prose: $lanes")
  }
}
