package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the crawl front door. A 100 TB crawl corpus
  * keys dedup, per-domain quality rollups, and blocklist decisions on
  * URLs, and raw crawl URLs are noisy: scheme/host case, redundant
  * default ports, dot-segments and duplicate slashes, unsorted query
  * params, fragments. One codegen'd per-row pass normalizes all of it
  * (no shuffle, no regex engine), so URL-grain joins/groupBys key on a
  * stable string. Canonical form, applied in order:
  *
  *   - scheme and host lowercase;
  *   - default port dropped (`:80` for http, `:443` for https; any
  *     other scheme/port combination kept verbatim);
  *   - userinfo kept verbatim (it is identity, not noise);
  *   - path dot-segments resolved (`.` dropped, `..` pops, never past
  *     the root), empty segments collapsed (`//` → `/`, and the
  *     trailing slash folds away: `/a/b/` → `/a/b`); an empty path
  *     canonicalizes to `/`;
  *   - query params split on `&`, empties dropped, remaining params
  *     sorted bytewise as whole `k=v` strings (duplicates kept — they
  *     are semantically meaningful), `?` dropped when nothing is left;
  *   - fragment dropped.
  *
  * Total and never null: input without `://` is returned unchanged
  * (a canonicalizer must not destroy rows it cannot parse), and the
  * function is idempotent — canon(canon(u)) == canon(u).
  *
  * The reference has no URL surface (it reads flow-log records); this
  * family is new-surface growth for the crawl/training-data pipeline
  * (VERDICT r17 item 7). DuckDB oracles verify via construction
  * arithmetic: the fixture builds messy URLs from id arithmetic and
  * the oracle predicts the canonical string from the same arithmetic,
  * so a match requires every rule above to actually fire.
  */
object UrlOps {

  def canon(u: UTF8String): UTF8String = UTF8String.fromString(canon(u.toString))

  def canon(s: String): String = {
    val sep = s.indexOf("://")
    if (sep < 0) return s
    val scheme = s.substring(0, sep).toLowerCase
    var rest = s.substring(sep + 3)
    val hIdx = rest.indexOf('#')
    if (hIdx >= 0) rest = rest.substring(0, hIdx)
    val qIdx = rest.indexOf('?')
    val queryRaw = if (qIdx >= 0) rest.substring(qIdx + 1) else null
    val authPath = if (qIdx >= 0) rest.substring(0, qIdx) else rest
    val pIdx = authPath.indexOf('/')
    val auth = if (pIdx >= 0) authPath.substring(0, pIdx) else authPath
    val pathRaw = if (pIdx >= 0) authPath.substring(pIdx) else ""
    val atIdx = auth.lastIndexOf('@')
    val userinfo = if (atIdx >= 0) auth.substring(0, atIdx + 1) else ""
    val hostPort = if (atIdx >= 0) auth.substring(atIdx + 1) else auth
    val cIdx = hostPort.lastIndexOf(':')
    val portDigits = cIdx >= 0 && cIdx < hostPort.length - 1 &&
      hostPort.substring(cIdx + 1).forall(c => c >= '0' && c <= '9')
    val host = (if (portDigits) hostPort.substring(0, cIdx) else hostPort).toLowerCase
    val port0 = if (portDigits) hostPort.substring(cIdx + 1) else ""
    val port =
      if (port0.isEmpty || (scheme == "http" && port0 == "80") ||
        (scheme == "https" && port0 == "443")) ""
      else ":" + port0
    val segs = pathRaw.split("/", -1)
    val out = new java.util.ArrayList[String](segs.length)
    segs.foreach {
      case "" | "." => ()
      case ".." => if (!out.isEmpty) out.remove(out.size - 1)
      case seg => out.add(seg)
    }
    val path = "/" + String.join("/", out)
    val query =
      if (queryRaw == null) ""
      else {
        val ps = queryRaw.split("&", -1).filter(_.nonEmpty).sorted
        if (ps.isEmpty) "" else "?" + ps.mkString("&")
      }
    scheme + "://" + userinfo + host + port + path + query
  }

  /** Canonical host of a URL (lowercased, port/userinfo stripped);
    * empty string when the input has no `://` authority.
    */
  def host(u: UTF8String): UTF8String = {
    val s = u.toString
    val sep = s.indexOf("://")
    if (sep < 0) return UTF8String.EMPTY_UTF8
    var rest = s.substring(sep + 3)
    var cut = rest.length
    var i = 0
    while (i < cut) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') cut = i else i += 1
    }
    rest = rest.substring(0, cut)
    val atIdx = rest.lastIndexOf('@')
    if (atIdx >= 0) rest = rest.substring(atIdx + 1)
    val cIdx = rest.lastIndexOf(':')
    if (cIdx >= 0 && cIdx < rest.length - 1 &&
      rest.substring(cIdx + 1).forall(c => c >= '0' && c <= '9'))
      rest = rest.substring(0, cIdx)
    UTF8String.fromString(rest.toLowerCase)
  }


  /** Canonical path of a URL — the same resolution [[canon]] applies
    * (dot-segments resolved, `..` never pops past the root, empty
    * segments and the trailing slash folded, empty path → `/`), as
    * its own extractor so path-prefix operators (robots rules,
    * section rollups) key on it without string-surgery on the full
    * canonical URL. Empty string when the input has no `://`
    * authority, mirroring [[host]]'s non-URL contract.
    */
  def path(u: UTF8String): UTF8String = {
    val s = u.toString
    val sep = s.indexOf("://")
    if (sep < 0) return UTF8String.EMPTY_UTF8
    var rest = s.substring(sep + 3)
    val hIdx = rest.indexOf('#')
    if (hIdx >= 0) rest = rest.substring(0, hIdx)
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) rest = rest.substring(0, qIdx)
    val pIdx = rest.indexOf('/')
    val pathRaw = if (pIdx >= 0) rest.substring(pIdx) else ""
    val segs = pathRaw.split("/", -1)
    val out = new java.util.ArrayList[String](segs.length)
    segs.foreach {
      case "" | "." => ()
      case ".." => if (!out.isEmpty) out.remove(out.size - 1)
      case seg => out.add(seg)
    }
    UTF8String.fromString("/" + String.join("/", out))
  }

  /** Embedded public-suffix subset. The real Mozilla PSL is ~9k rules
    * and updates continuously; this sandbox has no network, so the
    * operator ships a representative frozen subset (multi-label
    * ccTLD+SLD rules included — the case naive "last two labels"
    * breaks on) and documents the swap point: a production deployment
    * replaces this set with the full PSL snapshot it vendored.
    */
  private[graft] val publicSuffixes: Set[String] = Set(
    "com", "org", "net", "io", "edu", "gov", "mil", "int", "info", "biz",
    "dev", "app", "ai", "co",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "net.au", "org.au",
    "jp", "co.jp", "or.jp", "ne.jp",
    "de", "fr", "nl", "it", "es", "br", "com.br", "in", "co.in",
    "cn", "com.cn", "ru", "ca", "ch", "se", "no",
    "github.io", "gitlab.io", "blogspot.com", "s3.amazonaws.com")

  /** Registrable domain (eTLD+1) of a canonical host: one label plus
    * the LONGEST matching public suffix; hosts with no matching
    * suffix fall back to the PSL's `*` rule (last label is the
    * suffix → last two labels registrable); a host that IS a suffix,
    * or a single label, returns itself.
    */
  def registrable(hostU: UTF8String): UTF8String = {
    val host = hostU.toString
    val labels = host.split('.')
    if (labels.length < 2) return hostU
    var best = 0
    var k = 1
    while (k < labels.length) {
      val suf = labels.slice(labels.length - k, labels.length).mkString(".")
      if (publicSuffixes.contains(suf)) best = k
      k += 1
    }
    val take = math.min(labels.length, (if (best > 0) best else 1) + 1)
    UTF8String.fromString(
      labels.slice(labels.length - take, labels.length).mkString("."))
  }
}

/** Native expression: graft_url_canon(string) → string (total, never
  * null for non-null input — unparseable rows pass through verbatim).
  */
case class UrlCanon(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_canon"
  override protected def nullSafeEval(input: Any): Any =
    UrlOps.canon(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlOps.canon($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlCanon =
    copy(child = newChild)
}

/** Native expression: graft_url_host(string) → string (canonical
  * host; empty string for non-URLs).
  */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_host"
  override protected def nullSafeEval(input: Any): Any =
    UrlOps.host(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlOps.host($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}


/** Native expression: graft_url_path(string) → string (canonical
  * path, dot-segments resolved; empty string for non-URLs).
  */
case class UrlPath(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_path"
  override protected def nullSafeEval(input: Any): Any =
    UrlOps.path(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlOps.path($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlPath =
    copy(child = newChild)
}

/** Native expression: graft_registrable_domain(host string) → string. */
case class RegistrableDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_registrable_domain"
  override protected def nullSafeEval(input: Any): Any =
    UrlOps.registrable(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlOps.registrable($c)")
  override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
    copy(child = newChild)
}
