package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

/** URL/host curation: extraction edges, suffix-chain semantics, and the
  * two blocklist-filter forms (zero-shuffle closure vs broadcast table)
  * agreeing row-for-row. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(url).toDF("u").select(Web.host(col("u"))).head().getString(0)

  test("host extraction: scheme/userinfo/port/path/fragment stripped, lowercased") {
    assert(hostOf("https://example.org/path?q=1") == "example.org")
    assert(hostOf("http://User:pw@WWW.Example-3.ORG:8080/d/9?ref=1")
      == "www.example-3.org")
    assert(hostOf("HTTPS://A.B.EXAMPLE.IO#frag") == "a.b.example.io")
    assert(hostOf("ftp+ssh://host.net") == "host.net")
    // no scheme -> not a URL -> empty host (both engines return '')
    assert(hostOf("example.org/path") == "")
    assert(hostOf("") == "")
  }

  test("apexDomain: last two labels; single-label host is its own apex") {
    val got = Seq("a.b.example.org", "example.org", "localhost", "")
      .toDF("h").select(Web.apexDomain(col("h"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("example.org", "example.org", "localhost", ""))
  }

  test("apexDomainPsl: longest listed suffix wins, apex = suffix + one label") {
    val got = Seq(
      "shop.example.co.uk",  // multi-label PSL: apex is example.co.uk, NOT co.uk
      "example.co.uk",
      "co.uk",               // the host IS a public suffix -> its own apex
      "a.b.news.com.au",
      "a.b.example.org",     // unlisted suffix -> last-two-labels fallback
      "localhost")
      .toDF("h").select(Web.apexDomainPsl(col("h"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq(
      "example.co.uk", "example.co.uk", "co.uk",
      "news.com.au", "example.org", "localhost"))
  }

  test("apexDomainPsl: real-PSL wildcard and exception rules are interpreted, not literal") {
    // a fragment with all three rule forms plus the file noise a real
    // public_suffix_list.dat carries (comments, blanks, case, NULL rows
    // when table-ingested) — VERDICT r10 #5 / ADVICE r10
    val psl = Seq("// ck : https://en.wikipedia.org/wiki/.ck",
      "", "  ", "*.ck", "!www.ck", "CO.UK", null)
    val rules = Web.PslRules.parse(psl.filter(_ != null))
    assert(rules == Web.PslRules(Seq("co.uk"), Seq("ck"), Seq("www.ck")))
    val got = Seq(
      "foo.bar.ck",        // *.ck: bar.ck is a public suffix -> own apex
      "x.foo.bar.ck",      // ...and one more label resolves to foo.bar.ck
      "www.ck",            // !www.ck: registrable despite *.ck -> own apex
      "shop.www.ck",       // exception kills www.ck; ck unlisted -> fallback www.ck
      "a.shop.www.ck",     //   (the spec's remove-leftmost-label outcome)
      "shop.example.co.uk" // plain rule still longest-suffix resolves
    ).toDF("h").select(Web.apexDomainPsl(col("h"), psl.filter(_ != null)))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("foo.bar.ck", "foo.bar.ck", "www.ck",
      "www.ck", "www.ck", "example.co.uk"))
  }

  test("apexDomainPsl: unsupported rule forms are rejected loudly; NULL table rows drop") {
    for (bad <- Seq("*", "a.*.b", "*.a*.b", "!", ".co.uk", "co.uk."))
      withClue(bad) {
        assertThrows[IllegalArgumentException](Web.PslRules.parse(Seq("co.uk", bad)))
      }
    // NULL rows in a user-supplied PSL table must drop, not NPE the sort
    val withNull = Seq(Some("co.uk"), None, Some("*.ck")).toDF("suffix")
    assert(Web.suffixesOf(withNull) == Seq("*.ck", "co.uk"))
  }

  test("suffixesOf: a suffix TABLE feeds apexDomainPsl identically to the shipped list") {
    val tbl = Web.PublicSuffixes.toDF("suffix")
    val fromTable = Web.suffixesOf(tbl)
    val hosts = Seq("shop.example.co.uk", "x.gov.uk", "a.example.net").toDF("h")
    val a = hosts.select(Web.apexDomainPsl(col("h"), fromTable)).collect().map(_.getString(0))
    val b = hosts.select(Web.apexDomainPsl(col("h"))).collect().map(_.getString(0))
    assert(a.toSeq == b.toSeq)
  }

  test("hostSuffixes: every dot-suffix, most-specific first") {
    val got = Seq("a.b.example.org").toDF("h")
      .select(Web.hostSuffixes(col("h"))).head().getSeq[String](0)
    assert(got == Seq("a.b.example.org", "b.example.org", "example.org", "org"))
  }

  private val docs = Seq(
    (1L, "https://www.spam.org/x"),      // blocked via apex spam.org
    (2L, "https://spam.org/y"),          // blocked exactly
    (3L, "https://notspam.org/z"),       // NOT blocked (no label boundary)
    (4L, "https://cdn.ads.net:443/a"),   // blocked exactly (subdomain entry)
    (5L, "https://www.ads.net/b"),       // NOT blocked (sibling of entry)
    (6L, "https://deep.cdn.ads.net/c"),  // blocked (child of subdomain entry)
    (7L, "https://clean.io/d")           // survives
  ).toDF("doc_id", "url")
  private val blocked = Seq("spam.org", "cdn.ads.net")

  test("urlFilter: subdomain inheritance, label-boundary exactness") {
    val kept = Web.urlFilter(docs, "url", blocked)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 5L, 7L))
  }

  test("urlFilter: empty blocklist is the identity") {
    assert(Web.urlFilter(docs, "url", Nil).count() == 7)
  }

  test("urlFilterTable agrees with the closure form row-for-row") {
    val viaTable = Web.urlFilterTable(docs, "url", "doc_id",
        blocked.toDF("host"))
      .select("doc_id").as[Long].collect().sorted
    assert(viaTable.toSeq == Seq(3L, 5L, 7L))
  }

  test("urlFilter plans as scan -> filter: no exchange, no join") {
    val plan = Web.urlFilter(
        Tables.documents(spark, Sf0001)
          .withColumn("url", concat(lit("https://h"), col("doc_id"), lit(".org/"))),
        "url", blocked)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"blocklist filter is no longer a pure projection filter:\n$plan")
  }

  test("hostStats: rollups and exact distinct-language counts") {
    val d = Seq(
      ("https://a.org/1", "en", 10L, "x y z"),
      ("https://a.org/2", "de", 20L, "x y"),
      ("https://A.ORG:80/3", "en", 5L, "x"),
      ("https://b.b.net/4", "en", 7L, "")
    ).toDF("url", "lang", "n_chars", "text")
    val got = Web.hostStats(d, "url", "text", "n_chars", "lang")
      .orderBy("host").collect()
    assert(got.length == 2)
    val a = got.head
    assert(a.getString(0) == "a.org" && a.getString(1) == "a.org" &&
      a.getLong(2) == 3 && a.getLong(3) == 35 && a.getLong(4) == 6 &&
      a.getLong(5) == 2)
    val b = got(1)
    // empty text counts one (empty) token — the tokenCount contract
    assert(b.getString(0) == "b.b.net" && b.getString(1) == "b.net" &&
      b.getLong(2) == 1 && b.getLong(4) == 1 && b.getLong(5) == 1)
  }
}
