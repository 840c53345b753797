package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The URL / crawl front door (VERDICT r17 item 7 — new surface, no
  * reference analogue): canonicalization, registrable-domain
  * extraction, and the domain-grain rollup a 100 TB crawl corpus
  * gates ingest on. The operators are native codegen'd expressions
  * ([[graft.functions.UrlOps]]) — per-row string passes, no shuffle;
  * only the domain-grain aggregates shuffle, on keys whose
  * cardinality is the web's registrable-domain count, not the corpus.
  *
  * Fixture: documents have no URL column, so messy URLs derive from
  * doc_id arithmetic (the m16/m18 construction-oracle style) —
  * mixed-case schemes/hosts, redundant and non-default ports,
  * dot-segment/duplicate-slash/trailing-slash paths, unsorted query
  * params, fragments. The DuckDB oracle rebuilds the SAME raw strings
  * and predicts their canonical forms from HAND-DERIVED expectation
  * tables (never by calling the operator), so a hash match requires
  * every canonicalization rule to actually fire.
  */
object UrlQueries {

  // Raw component variants (fixture arithmetic) and their hand-derived
  // canonical expectations (oracle prediction tables). The canon
  // columns are authored by applying RFC 3986 §5.2.4 / §6.2.2 by hand
  // to each raw literal — independently of UrlOps.
  private val schemes  = Seq("http", "HTTPS", "https", "HtTp")
  private val schemesC = Seq("http", "https", "https", "http")
  private val hosts = Seq(
    "News.Example.COM", "blog.example.com", "Docs.Site.ORG",
    "cdn.site.org", "Shop.Example.CO.UK", "www.data.io")
  private val hostsC = Seq(
    "news.example.com", "blog.example.com", "docs.site.org",
    "cdn.site.org", "shop.example.co.uk", "www.data.io")
  // registrable domains per host: co.uk is a multi-label public
  // suffix, so shop.example.co.uk → example.co.uk (the case a naive
  // last-two-labels rule breaks on)
  private val domainsC = Seq(
    "example.com", "example.com", "site.org",
    "site.org", "example.co.uk", "data.io")
  private val ports = Seq(":80", "", ":443", ":8080", "")
  private val paths  = Seq("/a/b/../c", "/./x/y/", "//d//e", "/p/q", "", "/idx.html", "/r/s/./")
  private val pathsC = Seq("/a/c", "/x/y", "/d/e", "/p/q", "/", "/idx.html", "/r/s")
  private val querys  = Seq("?b=2&a=1", "?z=9&a=1&m=5", "")
  private val querysC = Seq("?a=1&b=2", "?a=1&m=5&z=9", "")
  private val frags = Seq("#frag", "")

  /** doc_id-indexed pick, Spark side (1-indexed element_at). */
  private def pick(vals: Seq[String], m: Int): Column =
    element_at(array(vals.map(lit): _*), (pmod(col("doc_id"), lit(m)) + 1).cast("int"))

  /** doc_id-indexed pick, DuckDB side (same arithmetic). */
  private def sqlPick(vals: Seq[String], m: Int): String =
    s"CASE doc_id % $m " +
      vals.zipWithIndex.map { case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ") +
      " END"

  /** The messy-URL fixture: (doc_id, text, url). */
  private def fixture(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"), col("text"),
      concat(
        pick(schemes, 4), lit("://"), pick(hosts, 6), pick(ports, 5),
        pick(paths, 7), pick(querys, 3), pick(frags, 2)).as("url"))

  /** DuckDB twin of [[fixture]]'s url column. */
  private val rawUrlSql: String =
    s"${sqlPick(schemes, 4)} || '://' || ${sqlPick(hosts, 6)} || ${sqlPick(ports, 5)} || " +
      s"${sqlPick(paths, 7)} || ${sqlPick(querys, 3)} || ${sqlPick(frags, 2)}"

  /** Predicted canonical URL from the expectation tables: default
    * port drops only against the CANONICAL scheme (http:80 / https:443).
    */
  private val canonUrlSql: String = {
    val sc = sqlPick(schemesC, 4)
    val pr = sqlPick(ports, 5)
    val portC =
      s"""CASE WHEN $pr = '' THEN ''
         |     WHEN $sc = 'http'  AND $pr = ':80'  THEN ''
         |     WHEN $sc = 'https' AND $pr = ':443' THEN ''
         |     ELSE $pr END""".stripMargin
    s"$sc || '://' || ${sqlPick(hostsC, 6)} || ($portC) || ${sqlPick(pathsC, 7)} || ${sqlPick(querysC, 3)}"
  }

  /** Robots-rule fixture (host, typ, path-prefix). Hand-authored over
    * the canonical host/path space so every semantic case occurs:
    * longest-match override (news /a vs /a/c; data.io /d vs /d/e),
    * an allow/disallow TIE at equal length (news /p/q — allow wins),
    * a deny-all-with-carve-out (docs.site.org), a no-rules host
    * (cdn.site.org — default allow), and multi-rule disallow
    * (shop). Per host no two rules share (prefix length, typ) unless
    * their prefixes are disjoint, so the longest-match argmax is
    * total for any single path in both engines.
    */
  private val robotsRules: Seq[(String, String, String)] = Seq(
    ("news.example.com", "disallow", "/a"),
    ("news.example.com", "allow", "/a/c"),
    ("news.example.com", "allow", "/p/q"),
    ("news.example.com", "disallow", "/p/q"),
    ("blog.example.com", "disallow", "/x"),
    ("docs.site.org", "disallow", "/"),
    ("docs.site.org", "allow", "/idx"),
    ("shop.example.co.uk", "disallow", "/p"),
    ("shop.example.co.uk", "disallow", "/r"),
    ("www.data.io", "allow", "/"),
    ("www.data.io", "allow", "/d"),
    ("www.data.io", "disallow", "/d/e"))

  /** DuckDB VALUES twin of [[robotsRules]]. */
  private val robotsRulesSql: String =
    robotsRules.map { case (h, t, pfx) => s"('$h', '$t', '$pfx')" }.mkString(", ")

  import graft.functions.{registrableDomain, tokenizeWs, urlCanon, urlHost, urlPath}

  val queries: Map[String, Q] = Map(
    // per-URL canonical form + host + registrable domain, all through
    // the native expressions; the oracle predicts every output string
    // from the construction arithmetic
    "u1_url_canon" -> ((s, dir) =>
      fixture(s, dir).select(
        col("doc_id"), col("url"),
        urlCanon(col("url")).as("canon_url"),
        urlHost(col("url")).as("host"),
        registrableDomain(urlHost(col("url"))).as("domain"))
        .orderBy("doc_id")),

    // domain-grain corpus rollup — the blocklist-decision report a
    // crawl pipeline reads before admitting a domain's docs: doc and
    // host counts, exact-dup mass (d1's normalized-text fingerprint),
    // whitespace-token mass, and the keep/review/block decision at
    // integer thresholds. Shuffles: one groupBy(fingerprint) for
    // corpus-wide multiplicity + one groupBy(domain) — both key-grain,
    // never byte-grain
    "u2_domain_rollup" -> ((s, dir) => {
      val keyed = fixture(s, dir).select(
        registrableDomain(urlHost(col("url"))).as("domain"),
        urlHost(col("url")).as("host"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("k"),
        size(tokenizeWs(col("text"))).cast("long").as("n_toks"))
      val mult = keyed.groupBy("k").agg(count(lit(1)).as("n_occ"))
      keyed.join(mult, "k")
        .groupBy("domain")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"),
          sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(col("n_toks")).as("n_tokens"))
        .withColumn("decision",
          when(col("n_dup_docs") * 100 >= col("n_docs") * 50, "block")
            .when(col("n_dup_docs") * 100 >= col("n_docs") * 20, "review")
            .otherwise("keep"))
        .orderBy("domain")
    }),

    // canonicalization doing real work: raw URL variants that collapse
    // onto one canonical form (scheme case, default ports, fragments,
    // dot-segments) — the URL-grain dedup gain a crawl gets for free
    // once it keys on canon_url instead of the raw string
    "u3_canon_collapse" -> ((s, dir) =>
      fixture(s, dir)
        .select(urlCanon(col("url")).as("canon_url"), col("url"))
        .groupBy("canon_url")
        .agg(countDistinct(col("url")).as("n_raw_forms"), count(lit(1)).as("n_docs"))
        .where(col("n_raw_forms") > 1)
        .orderBy("canon_url")),

    // robots-style crawl-politeness gate: per-host allow/disallow
    // path-prefix rules, longest match wins, allow beats disallow on
    // a length tie (Google robots semantics), hosts with no rules
    // default-allow. 100 TB shape: the rules broadcast GROUPED per
    // host (one array per host) and every URL folds its own host's
    // list in a single map pass (array_max over (plen, is_allow)
    // structs) — the corpus never hash-shuffles and there is no
    // per-candidate row explosion; the only corpus exchange is the
    // final orderBy. The oracle re-derives every verdict from the
    // same hand-authored rule literals via a window argmax.
    "u4_robots_filter" -> ((s, dir) => {
      val rules = s.createDataFrame(robotsRules).toDF("r_host", "typ", "prefix")
      val byHost = rules.groupBy("r_host").agg(
        collect_list(struct(
          length(col("prefix")).as("plen"),
          (col("typ") === "allow").cast("int").as("is_allow"),
          col("prefix").as("prefix"),
          col("typ").as("typ"))).as("rs"))
      fixture(s, dir)
        .select(col("doc_id"), col("url"),
          urlHost(col("url")).as("host"), urlPath(col("url")).as("path"))
        .join(broadcast(byHost), col("host") === col("r_host"), "left")
        .withColumn("m", array_max(expr("filter(rs, r -> startswith(path, r.prefix))")))
        .select(col("doc_id"), col("url"), col("host"), col("path"),
          when(col("m").isNull || col("m.is_allow") === 1, lit("allow"))
            .otherwise(lit("deny")).as("verdict"),
          coalesce(col("m.prefix"), lit("-")).as("matched_prefix"))
        .orderBy("doc_id")
    }),

    // per-host crawl-budget allocation by largest-remainder (Hamilton)
    // apportionment: budget = N div 3 docs, base share floor(budget *
    // n_h / N), the leftover distributed one-each by remainder rank
    // (rem desc, host asc — a total order, so both engines agree; the
    // fixture hits a multi-way remainder tie decided by host order).
    // Integer-exact end to end; conservation sum(quota) = budget holds
    // by construction (leftover < n_hosts). 100 TB shape: the
    // allocation runs on the HOST-GRAIN aggregate — the global rank
    // window sorts the rollup table (web scale: millions of hosts),
    // never the corpus; the corpus contributes one count aggregate.
    "u5_crawl_budget" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = fixture(s, dir)
        .select(urlHost(col("url")).as("host"))
        .groupBy("host").agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(
        sum("n_docs").as("n_total"),
        expr("sum(n_docs) div 3").as("budget"))
      val b = counts.crossJoin(broadcast(tot))
        .withColumn("base", expr("(budget * n_docs) div n_total"))
        .withColumn("rem", col("budget") * col("n_docs") - col("base") * col("n_total"))
      val lt = b.agg(sum("base").as("base_sum"))
      b.crossJoin(broadcast(lt))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("host").asc)))
        .select(
          col("host"), col("n_docs"), col("base"),
          when(col("rk") <= col("budget") - col("base_sum"), 1L)
            .otherwise(0L).as("extra"),
          (col("base") + when(col("rk") <= col("budget") - col("base_sum"), 1L)
            .otherwise(0L)).as("quota"))
        .orderBy("host")
    }))

  val oracleSql: Map[String, String] = Map(
    "u1_url_canon" ->
      s"""WITH f AS (
         |  SELECT doc_id, $rawUrlSql AS url, $canonUrlSql AS canon_url,
         |    ${sqlPick(hostsC, 6)} AS host, ${sqlPick(domainsC, 6)} AS domain
         |  FROM documents
         |)
         |SELECT doc_id, url, canon_url, host, domain FROM f ORDER BY doc_id""".stripMargin,
    "u2_domain_rollup" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, ${sqlPick(domainsC, 6)} AS domain, ${sqlPick(hostsC, 6)} AS host,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS k,
         |    len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n_toks
         |  FROM documents
         |), m AS (
         |  SELECT k, count(*) AS n_occ FROM f GROUP BY 1
         |), g AS (
         |  SELECT domain, count(*)::BIGINT AS n_docs, count(DISTINCT host)::BIGINT AS n_hosts,
         |    sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
         |    sum(n_toks)::BIGINT AS n_tokens
         |  FROM f JOIN m USING (k) GROUP BY 1
         |)
         |SELECT domain, n_docs, n_hosts, n_dup_docs, n_tokens,
         |  CASE WHEN n_dup_docs * 100 >= n_docs * 50 THEN 'block'
         |       WHEN n_dup_docs * 100 >= n_docs * 20 THEN 'review'
         |       ELSE 'keep' END AS decision
         |FROM g ORDER BY domain""".stripMargin,
    "u3_canon_collapse" ->
      s"""WITH f AS (
         |  SELECT doc_id, $rawUrlSql AS url, $canonUrlSql AS canon_url FROM documents
         |)
         |SELECT canon_url, count(DISTINCT url)::BIGINT AS n_raw_forms, count(*)::BIGINT AS n_docs
         |FROM f GROUP BY 1 HAVING count(DISTINCT url) > 1 ORDER BY canon_url""".stripMargin,
    "u4_robots_filter" ->
      s"""WITH f AS (
         |  SELECT doc_id, $rawUrlSql AS url, ${sqlPick(hostsC, 6)} AS host,
         |    ${sqlPick(pathsC, 7)} AS path
         |  FROM documents
         |), r(host, typ, prefix) AS (
         |  VALUES $robotsRulesSql
         |), j AS (
         |  SELECT f.doc_id, r.typ, r.prefix,
         |    row_number() OVER (PARTITION BY f.doc_id
         |      ORDER BY len(r.prefix) DESC,
         |               CASE WHEN r.typ = 'allow' THEN 1 ELSE 0 END DESC) AS rn
         |  FROM f JOIN r ON f.host = r.host AND starts_with(f.path, r.prefix)
         |)
         |SELECT f.doc_id, f.url, f.host, f.path,
         |  CASE WHEN j.typ IS NULL OR j.typ = 'allow' THEN 'allow' ELSE 'deny' END AS verdict,
         |  coalesce(j.prefix, '-') AS matched_prefix
         |FROM f LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON f.doc_id = j.doc_id
         |ORDER BY f.doc_id""".stripMargin,
    "u5_crawl_budget" ->
      s"""WITH f AS (
         |  SELECT ${sqlPick(hostsC, 6)} AS host FROM documents
         |), c AS (
         |  SELECT host, count(*)::BIGINT AS n_docs FROM f GROUP BY 1
         |), t AS (
         |  SELECT sum(n_docs)::BIGINT AS n_total, sum(n_docs)::BIGINT // 3 AS budget FROM c
         |), b AS (
         |  SELECT host, n_docs, n_total, budget,
         |    (budget * n_docs) // n_total AS base,
         |    budget * n_docs - ((budget * n_docs) // n_total) * n_total AS rem
         |  FROM c, t
         |), r AS (
         |  SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rk,
         |    (SELECT sum(base)::BIGINT FROM b) AS base_sum
         |  FROM b
         |)
         |SELECT host, n_docs, base,
         |  (CASE WHEN rk <= budget - base_sum THEN 1 ELSE 0 END)::BIGINT AS extra,
         |  (base + CASE WHEN rk <= budget - base_sum THEN 1 ELSE 0 END)::BIGINT AS quota
         |FROM r ORDER BY host""".stripMargin)
}
