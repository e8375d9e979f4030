package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{PiiScrub, TextFuncs}

/** Pins the fused PII byte scanners to the regex formulation they
  * replaced. The referee is java.util.regex ITSELF (the engine the
  * scanners claim to replicate): counts = non-overlapping finds on the
  * original text, scrub = the three replaceAll passes in order. A
  * scanner/pattern divergence fails here before it can reach the DuckDB
  * gate. Seeded generator over a PII-rich alphabet (dense in '@' '.'
  * '-' '+' digits and multi-byte chars — far denser than real text, to
  * hit the backtracking corners), 800 cases + hand-picked edges.
  */
class PiiScrubSpec extends AnyFunSuite {

  private val expr = PiiScrub(Literal("referee"))

  private def fused(s: String): (String, Int, Int, Int) = {
    val r = expr.scrubOf(UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3))
  }

  private val compiled = TextFuncs.piiPatterns.map { case (_, p, repl) =>
    (java.util.regex.Pattern.compile(p), repl)
  }

  private def referee(s: String): (String, Int, Int, Int) = {
    val counts = compiled.map { case (p, _) =>
      val m = p.matcher(s)
      var c = 0
      while (m.find()) c += 1
      c
    }
    val scrubbed = compiled.foldLeft(s) { case (t, (p, repl)) =>
      p.matcher(t).replaceAll(
        java.util.regex.Matcher.quoteReplacement(repl))
    }
    (scrubbed, counts(0), counts(1), counts(2))
  }

  private def check(s: String): Unit =
    assert(fused(s) == referee(s), s"input: '$s'")

  test("hand-picked backtracking edges match java.util.regex") {
    Seq(
      "", "@", "+", ".", "a@b", "a@b.c", "a@b.co", "a@b.co.uk3",
      "a@b@c.com", "a@b.xyz.9", "a@b.comm5.xy", "x@y.zz!", "a.b@c",
      "user12345678901@x.com", "999999999user@x.com",
      "a%b_c+d-e.f@g-h.i.jk lmn", "@@a@@b.cd@@",
      "12345678", "123456789", "+123456789", "+-123456789",
      "1-2-3-4-5-6-7-8-9", "123456789-", "555-1234",
      "123456789123456789", "+1-800-555-0199 or 020-7946-0958",
      "1234.5.6.7", "1.2.3.45678", "1.2.3.4.5.6", "1.2345.6.7",
      "192.168.001.1", "1.2.3.", ".1.2.3.4", "1..2.3.4",
      "9999999999.1.2.3", "contact user7@mail.example.com or " +
        "+1-555-0007 from 10.7.0.1",
      "é123456789é a@b.com €1.2.3.4", "käse@straße.de 1.2.3.4",
      "<EMAIL> 123456789 <PHONE> 1.2.3.4 <IP>",
      "a@b.cd123456789e@f.gh", "1.2.3.4a@b.cd", "12345678a@b.cd9",
      "phone+123456789012@x.co", "+12345678@a.bc").foreach(check)
  }

  test("seeded property sweep over a PII-dense alphabet") {
    val rnd = new scala.util.Random(19)
    val alphabet =
      "aaabcXYZ0123456789999....----+++@@@__%%  éé€\tz"
    def gen(): String = {
      val n = rnd.nextInt(120)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        // occasional dense digit/dot runs to exercise long-run phone/ip
        // backtracking, otherwise uniform alphabet draws
        if (rnd.nextInt(12) == 0)
          sb.append((0 until 3 + rnd.nextInt(12)).map(_ =>
            "0123456789.-"(rnd.nextInt(12))).mkString)
        else sb.append(alphabet(rnd.nextInt(alphabet.length)))
      }
      sb.toString
    }
    (0 until 800).foreach(_ => check(gen()))
  }

  test("DataFrame plumbing matches the regex formulation end to end") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (1L, "reach jane.doe+spam@corp.example.org or +1-800-555-0199"),
      (2L, "999999999user@x.com via 10.0.0.1 and 1234.5.6.7"),
      (3L, "no pii at all"),
      (4L, "a@b@c.com 1-2-3-4-5-6-7-8-9 é€ züge"))
    val df = rows.toDF("doc_id", "text")
    val got = TextFuncs.piiScrub(df, "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = TextFuncs.piiScrubRegex(df, "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
