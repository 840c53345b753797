package graft

import org.apache.spark.sql.functions._

import graft.functions.{registrableDomain, urlCanon, urlHost, UrlOps}

/** URL front door (u1/u2/u3): canonicalization rules one-by-one,
  * totality/idempotence, registrable-domain suffix logic, and the
  * expressions executing through real Spark plans (codegen path).
  */
class UrlSpec extends SparkSpec {

  test("u1: canonicalization rules fire individually and compose") {
    // scheme + host case
    assert(UrlOps.canon("HTTPS://News.Example.COM/p") === "https://news.example.com/p")
    // default ports drop only for their scheme
    assert(UrlOps.canon("http://h.com:80/a") === "http://h.com/a")
    assert(UrlOps.canon("https://h.com:443/a") === "https://h.com/a")
    assert(UrlOps.canon("https://h.com:80/a") === "https://h.com:80/a")
    assert(UrlOps.canon("http://h.com:8080/a") === "http://h.com:8080/a")
    // dot-segments, duplicate slashes, trailing slash
    assert(UrlOps.canon("http://h.com/a/b/../c") === "http://h.com/a/c")
    assert(UrlOps.canon("http://h.com/./x/y/") === "http://h.com/x/y")
    assert(UrlOps.canon("http://h.com//d//e") === "http://h.com/d/e")
    assert(UrlOps.canon("http://h.com/a/../../..") === "http://h.com/")
    assert(UrlOps.canon("http://h.com") === "http://h.com/")
    // query sort (duplicates kept), empty params dropped, bare ? dropped
    assert(UrlOps.canon("http://h.com/p?b=2&a=1") === "http://h.com/p?a=1&b=2")
    assert(UrlOps.canon("http://h.com/p?b=2&&a=1&") === "http://h.com/p?a=1&b=2")
    assert(UrlOps.canon("http://h.com/p?a=2&a=1") === "http://h.com/p?a=1&a=2")
    assert(UrlOps.canon("http://h.com/p?") === "http://h.com/p")
    // fragment dropped; userinfo kept
    assert(UrlOps.canon("http://h.com/p#frag") === "http://h.com/p")
    assert(UrlOps.canon("http://u:pw@H.com/p") === "http://u:pw@h.com/p")
    // totality: non-URLs pass through verbatim
    assert(UrlOps.canon("not a url") === "not a url")
    assert(UrlOps.canon("") === "")
  }

  test("u1: canon is idempotent on the whole fixture space") {
    for {
      sch <- Seq("http", "HTTPS", "HtTp")
      port <- Seq("", ":80", ":443", ":8080")
      path <- Seq("", "/a/b/../c", "//d//e/", "/p/q")
      q <- Seq("", "?b=2&a=1")
      f <- Seq("", "#x")
    } {
      val u = s"$sch://Ho.St$port$path$q$f"
      val once = UrlOps.canon(u)
      assert(UrlOps.canon(once) === once, s"not idempotent on $u")
    }
  }

  test("u1: registrable domain honors multi-label suffixes and falls back per the PSL * rule") {
    def reg(h: String): String =
      UrlOps.registrable(org.apache.spark.unsafe.types.UTF8String.fromString(h)).toString
    assert(reg("news.example.com") === "example.com")
    assert(reg("shop.example.co.uk") === "example.co.uk") // NOT co.uk or example.co.uk's parent
    assert(reg("deep.sub.blog.github.io") === "blog.github.io") // github.io is itself a suffix
    assert(reg("a.b.unknowntld") === "b.unknowntld") // * rule: last label is the suffix
    assert(reg("example.com") === "example.com")
    assert(reg("com") === "com") // a bare suffix returns itself
    assert(reg("localhost") === "localhost")
  }

  test("u1-u3: expressions execute through real Spark plans and agree with the direct functions") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://News.Example.COM:443/a/b/../c?b=2&a=1#frag",
      "http://Shop.Example.CO.UK:8080//d//e/",
      "not a url")
    val got = urls.toDF("url")
      .select(
        urlCanon(col("url")).as("c"),
        urlHost(col("url")).as("h"),
        registrableDomain(urlHost(col("url"))).as("d"))
      .as[(String, String, String)].collect().toSeq
    assert(got(0) === (("https://news.example.com/a/c?a=1&b=2", "news.example.com", "example.com")))
    assert(got(1) === (("http://shop.example.co.uk:8080/d/e", "shop.example.co.uk", "example.co.uk")))
    assert(got(2) === (("not a url", "", "")))
  }

  test("u2: rollup accounting is consistent and the decision thresholds are exact") {
    val df = SparkEntry.queries("u2_domain_rollup")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nDup) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"))
      assert(nDup <= nDocs)
      val expect =
        if (nDup * 100 >= nDocs * 50) "block"
        else if (nDup * 100 >= nDocs * 20) "review"
        else "keep"
      assert(r.getAs[String]("decision") === expect)
    }
    // doc mass is conserved across domains
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("u3: every collapse group's members canonicalize to its key") {
    val df = SparkEntry.queries("u3_canon_collapse")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture should produce collapsing raw forms")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_raw_forms") > 1)
      assert(r.getAs[Long]("n_docs") >= r.getAs[Long]("n_raw_forms"))
      // the key is itself canonical (idempotence at the group grain)
      val k = r.getAs[String]("canon_url")
      assert(UrlOps.canon(k) === k)
    }
  }

  test("u4: canonical path extraction mirrors canon's path rules") {
    def p(u: String): String =
      UrlOps.path(org.apache.spark.unsafe.types.UTF8String.fromString(u)).toString
    assert(p("http://h.com/a/b/../c?q=1#f") === "/a/c")
    assert(p("HTTP://h.com") === "/")
    assert(p("http://h.com//d//e/") === "/d/e")
    assert(p("http://h.com/a/../../..") === "/")
    assert(p("http://u:pw@h.com:8080/p/q") === "/p/q")
    assert(p("not a url") === "")
    // agreement with canon: the canonical URL's path IS this path
    for (u <- Seq("https://H.com:443/x/./y/?b=2&a=1", "http://h.io//a//", "http://h.io"))
      assert(UrlOps.canon(u).contains(p(u)), s"canon/path disagree on $u")
  }

  test("u4: robots semantics — longest match wins, allow beats disallow on ties, no rules ⇒ allow") {
    val rows = SparkEntry.queries("u4_robots_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    def one(host: String, path: String): (String, String) = {
      val r = rows.filter(x =>
        x.getAs[String]("host") == host && x.getAs[String]("path") == path)
      assert(r.nonEmpty, s"fixture must cover ($host, $path)")
      val vs = r.map(x =>
        (x.getAs[String]("verdict"), x.getAs[String]("matched_prefix"))).distinct
      assert(vs.length === 1, s"verdict must be a pure function of (host, path): $vs")
      vs.head
    }
    // longest-match override in both directions
    assert(one("news.example.com", "/a/c") === (("allow", "/a/c")))
    assert(one("www.data.io", "/d/e") === (("deny", "/d/e")))
    // equal-length allow/disallow tie: allow wins
    assert(one("news.example.com", "/p/q") === (("allow", "/p/q")))
    // deny-all with a carve-out
    assert(one("docs.site.org", "/idx.html") === (("allow", "/idx")))
    assert(one("docs.site.org", "/x/y") === (("deny", "/")))
    // a host with no rules defaults to allow with no matched rule
    assert(one("cdn.site.org", "/p/q") === (("allow", "-")))
  }

  test("u5: largest-remainder allocation conserves the budget exactly") {
    val rows = SparkEntry.queries("u5_crawl_budget")(spark, sf).collect()
    assert(rows.length === 6) // one row per fixture host
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    val budget = nTotal / 3
    assert(rows.map(_.getAs[Long]("quota")).sum === budget)
    rows.foreach { r =>
      val (base, extra, quota) =
        (r.getAs[Long]("base"), r.getAs[Long]("extra"), r.getAs[Long]("quota"))
      assert(extra === 0L || extra === 1L)
      assert(quota === base + extra)
      // a host's base share never exceeds its exact proportional share
      assert(base * nTotal <= budget * r.getAs[Long]("n_docs"))
    }
  }
}
