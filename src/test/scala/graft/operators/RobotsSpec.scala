package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** robots.txt (RFC 9309): group grammar (consecutive agent lines,
  * blank-line tolerance, comments, case), agent selection, the
  * longest-match / Allow-tie precedence, wildcard + anchor
  * compilation (LIKE metacharacters stay literal), and edge postures
  * (empty rule value, rule-less host, equal-length tie).
  */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def verdicts(robots: Seq[(String, String)],
      urls: Seq[(String, String)],
      agent: String = "graftbot"): Map[(String, String), (Boolean, String)] = {
    val r = Robots.parseRules(robots.toDF("host", "robots"), "host", "robots")
    Robots.filterUrls(urls.toDF("host", "path"), r, agent, "host", "path")
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getBoolean(2), x.getString(3)))
      .toMap
  }

  test("group grammar: consecutive agent lines share rules; blank lines and comments are inert") {
    val txt =
      """# policy
        |User-agent: alphabot
        |User-Agent: graftbot
        |
        |Disallow: /a/
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val v = verdicts(Seq(("h", txt)), Seq(("h", "/a/x"), ("h", "/b")))
    // graftbot shares the first group (consecutive UA lines) even with a
    // blank line before its rules; the deny-all * group is ignored
    assert(v(("h", "/a/x")) === ((false, "/a/")))
    assert(v(("h", "/b")) === ((true, null)))
    // alphabot sees the same rules
    val v2 = verdicts(Seq(("h", txt)), Seq(("h", "/a/x")), agent = "AlphaBot")
    assert(v2(("h", "/a/x"))._1 === false)
    // an agent in NO group falls back to * (deny-all here)
    val v3 = verdicts(Seq(("h", txt)), Seq(("h", "/b")), agent = "otherbot")
    assert(v3(("h", "/b"))._1 === false)
  }

  test("longest pattern wins; Allow beats Disallow on equal length") {
    val txt = "User-agent: *\nDisallow: /dir/\nAllow: /dir/ok/\n" +
      "Disallow: /t/x\nAllow: /t/y\n"
    val v = verdicts(Seq(("h", txt)),
      Seq(("h", "/dir/ok/p"), ("h", "/dir/no"), ("h", "/t/x"), ("h", "/t/y")))
    assert(v(("h", "/dir/ok/p")) === ((true, "/dir/ok/")))
    assert(v(("h", "/dir/no")) === ((false, "/dir/")))
    assert(v(("h", "/t/x"))._1 === false)
    assert(v(("h", "/t/y"))._1 === true)
    // equal length, both rule types on the SAME path: allow wins
    val tie = "User-agent: *\nDisallow: /p/\nAllow: /p/\n"
    assert(verdicts(Seq(("h", tie)), Seq(("h", "/p/q")))(("h", "/p/q"))._1)
  }

  test("wildcards and anchors compile correctly; LIKE metachars stay literal") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a*b/\n" +
      "Disallow: /lit%x/\nDisallow: /und_y/\n"
    val v = verdicts(Seq(("h", txt)), Seq(
      ("h", "/doc/report.pdf"), ("h", "/doc/report.pdfs"),
      ("h", "/aXXXb/z"), ("h", "/ab/z"),
      ("h", "/lit%x/1"), ("h", "/litQx/1"),
      ("h", "/und_y/1"), ("h", "/undZy/1")))
    assert(v(("h", "/doc/report.pdf"))._1 === false) // anchor hits
    assert(v(("h", "/doc/report.pdfs"))._1 === true) // anchor protects
    assert(v(("h", "/aXXXb/z"))._1 === false) // * spans
    assert(v(("h", "/ab/z"))._1 === false)    // * matches empty
    assert(v(("h", "/lit%x/1"))._1 === false) // literal %
    assert(v(("h", "/litQx/1"))._1 === true)  // % did NOT become a wildcard
    assert(v(("h", "/und_y/1"))._1 === false) // literal _
    assert(v(("h", "/undZy/1"))._1 === true)  // _ did NOT become a wildcard
  }

  test("empty rule value is no rule; rule-less hosts allow everything") {
    val txt = "User-agent: *\nDisallow:\n"
    val v = verdicts(Seq(("h", txt)), Seq(("h", "/anything")))
    assert(v(("h", "/anything")) === ((true, null)))
    val v2 = verdicts(Seq.empty, Seq(("nude", "/x")))
    assert(v2(("nude", "/x")) === ((true, null)))
  }

  test("CRLF line endings parse identically to LF (RFC 9309 permits both)") {
    val lf = "User-agent: graftbot\nDisallow: /private/\nAllow: /private/pub/\n" +
      "User-agent: *\nDisallow: /\n"
    val crlf = lf.replace("\n", "\r\n")
    val urls = Seq(("h", "/private/x"), ("h", "/private/pub/y"), ("h", "/ok"))
    val vLf = verdicts(Seq(("h", lf)), urls)
    val vCrlf = verdicts(Seq(("h", crlf)), urls)
    assert(vCrlf === vLf)
    // the load-bearing cases: named-group selection still matches (no
    // trailing \r in the agent token) and patterns still hit (no \r in
    // the LIKE pattern) — a regression here fails the gate OPEN
    assert(vCrlf(("h", "/private/x"))._1 === false)
    assert(vCrlf(("h", "/private/pub/y"))._1 === true)
    assert(vCrlf(("h", "/ok"))._1 === true)
  }

  test("ranking length excludes the trailing $ anchor (RFC 9309 §2.2.2)") {
    // 'Allow: /pq' (len 3) vs 'Disallow: /pq$' (raw 4, ranking 3):
    // equal ranking length -> allow wins the tie on /pq
    val tie = "User-agent: *\nAllow: /pq\nDisallow: /pq$\n"
    assert(verdicts(Seq(("h", tie)), Seq(("h", "/pq")))(("h", "/pq"))._1)
    // but a LONGER anchored disallow still outranks: /pqr$ ranks 4 > 3
    val win = "User-agent: *\nAllow: /pq\nDisallow: /pqr$\n"
    val v = verdicts(Seq(("h", win)), Seq(("h", "/pqr"), ("h", "/pq")))
    assert(v(("h", "/pqr"))._1 === false)
    assert(v(("h", "/pq"))._1 === true) // anchor protects the prefix
  }

  test("ranking length is OCTETS (RFC 9309 §2.2.2), not characters") {
    // 'Disallow: /*é' = 3 chars but 4 OCTETS; 'Allow: /x*' = 3 chars,
    // 3 octets. Both match /xé. Char ranking ties (allow would win);
    // octet ranking gives disallow 4 > 3 — the conformant verdict.
    val txt = "User-agent: *\nDisallow: /*é\nAllow: /x*\n"
    val v = verdicts(Seq(("h", txt)), Seq(("h", "/xé")))
    assert(v(("h", "/xé"))._1 === false,
      "octet-weighted disallow must outrank the char-tied allow")
  }

  test("equal-rank same-type patterns pick the matched pattern deterministically") {
    // /abc (4 octets) vs /abc$ (raw 5, ranking 4): identical sort keys
    // up to the final pattern tiebreak — the reported matched pattern
    // must be the lexicographically first, every run
    val txt = "User-agent: *\nAllow: /abc\nAllow: /abc$\nDisallow: /a\n"
    (1 to 3).foreach { _ =>
      val v = verdicts(Seq(("h", txt)), Seq(("h", "/abc")))
      assert(v(("h", "/abc")) === ((true, "/abc")))
    }
  }

  test("the verdict is per (host, path): same path on different hosts differs") {
    val v = verdicts(
      Seq(("a", "User-agent: *\nDisallow: /p/\n"),
        ("b", "User-agent: *\nAllow: /\n")),
      Seq(("a", "/p/1"), ("b", "/p/1")))
    assert(v(("a", "/p/1"))._1 === false)
    assert(v(("b", "/p/1"))._1 === true)
  }
}
