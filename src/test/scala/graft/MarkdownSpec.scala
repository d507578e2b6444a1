package graft

import graft.sources.Normalize.renderMarkdown
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property tests for the one custom scalar (A23,
  * facebook.rkt:30-32), in the spirit of the reference's quickcheck
  * properties over hash.rkt (hash.rkt:110-140). Raw ScalaCheck (no
  * scalatestplus bridge in the offline cache). */
class MarkdownSpec extends AnyFunSuite {

  private def holds(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
      .passed)

  test("wraps in the reference's envelope") {
    assert(renderMarkdown("hi") ==
      "<div class=\"event-api-content\"><p>hi</p></div>")
  }

  test("emphasis and paragraphs") {
    assert(renderMarkdown("a *b* c\n\nd") ==
      "<div class=\"event-api-content\"><p>a <em>b</em> c</p><p>d</p></div>")
  }

  test("links render as anchors (reference renders [t](u) via its md lib)") {
    assert(renderMarkdown("see [Papers We Love](https://paperswelove.org) now") ==
      "<div class=\"event-api-content\"><p>see " +
        "<a href=\"https://paperswelove.org\">Papers We Love</a> now</p></div>")
  }

  test("links render before emphasis (emphasis can wrap an anchor)") {
    assert(renderMarkdown("*see [ab](u)*") ==
      "<div class=\"event-api-content\"><p>" +
        "<em>see <a href=\"u\">ab</a></em></p></div>")
  }

  test("bold renders before emphasis; code spans render first") {
    assert(renderMarkdown("**b** and *e* and `c`") ==
      "<div class=\"event-api-content\"><p><strong>b</strong> and " +
        "<em>e</em> and <code>c</code></p></div>")
  }

  test("single-line # blocks render as headers, by level") {
    assert(renderMarkdown("## Agenda\n\nbody") ==
      "<div class=\"event-api-content\"><h2>Agenda</h2><p>body</p></div>")
    // 7 #'s is not a header; a block with a newline is not a header
    assert(renderMarkdown("####### nope").contains("<p>####### nope</p>"))
    assert(renderMarkdown("# a\nb").contains("<p># a\nb</p>"))
  }

  test("all-dash blocks render as unordered lists") {
    assert(renderMarkdown("- one\n- two") ==
      "<div class=\"event-api-content\"><ul><li>one</li><li>two</li></ul></div>")
    // a mixed block is NOT a list
    assert(renderMarkdown("- one\ntwo").contains("<p>- one\ntwo</p>"))
  }

  test("all-numbered blocks render as ordered lists") {
    assert(renderMarkdown("1. one\n2. two\n10. ten") ==
      "<div class=\"event-api-content\"><ol><li>one</li><li>two</li>" +
        "<li>ten</li></ol></div>")
    // a mixed block is NOT a list; a number without ". " is not an item
    assert(renderMarkdown("1. one\ntwo").contains("<p>1. one\ntwo</p>"))
    assert(renderMarkdown("1.one").contains("<p>1.one</p>"))
  }

  test("escapes HTML before rendering") {
    assert(renderMarkdown("<script>&") ==
      "<div class=\"event-api-content\"><p>&lt;script&gt;&amp;</p></div>")
  }

  test("null passes through (reference 'null handling)") {
    assert(renderMarkdown(null) == null)
  }

  test("property: total on arbitrary strings, always enveloped") {
    holds(Prop.forAll { (s: String) =>
      val out = renderMarkdown(s)
      out.startsWith("<div class=\"event-api-content\">") && out.endsWith("</div>")
    })
  }

  test("property: no unescaped angle brackets survive from the input") {
    holds(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val inner = renderMarkdown(s)
        .stripPrefix("<div class=\"event-api-content\">").stripSuffix("</div>")
      val stripped = inner
        .replaceAll("</?(p|em|strong|code|ul|ol|li|h[1-6]|a)>", "")
        .replaceAll("<a href=\"[^\"]*\">", "")
      !stripped.contains('<')
    })
  }
}
