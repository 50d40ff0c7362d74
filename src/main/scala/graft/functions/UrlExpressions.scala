package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6 URL normalization as a one-pass native expression — the
  * web-corpus intake primitive that makes URL-level dedup and per-host
  * budgets well-defined (two crawls of the same page rarely record the
  * byte-identical URL; canonicalization is what collapses them).
  *
  * Normalizations applied, in the RFC's own terms:
  *  - case (§6.2.2.1): scheme and host lowercased;
  *  - percent-encoding (§6.2.2.2): `%XX` of UNRESERVED characters
  *    (ALPHA / DIGIT / `-._~`) decoded; every surviving escape's hex
  *    uppercased; malformed escapes left byte-for-byte intact;
  *  - path segments (§6.2.2.3): `remove_dot_segments` applied
  *    verbatim (§5.2.4), empty path → `/`;
  *  - scheme defaults (§6.2.3): `:80` dropped for http, `:443` for
  *    https;
  *  - plus the two conventions every search/crawl pipeline layers on
  *    top (documented as such, they are NOT in the RFC): the fragment
  *    is dropped, and query parameters are sorted by their full
  *    `key=value` text so parameter order cannot fork a URL's
  *    identity. Duplicate slashes are deliberately KEPT (the RFC
  *    assigns them meaning).
  *
  * NULL for inputs with no `://` or an empty host — unparseable rows
  * are data to filter, not task failures.
  */
final case class UrlCanonicalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_canon"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.sql}")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UrlCanonicalize = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val out = UrlCanonicalize.canonicalize(input.asInstanceOf[UTF8String]
      .toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

object UrlCanonicalize {

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** §6.2.2.2: decode unreserved escapes, uppercase the rest; broken
    * escapes pass through untouched. */
  private[functions] def pctNormalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
        hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** §5.2.4 remove_dot_segments, verbatim. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      }
      else if (in == "." || in == "..") in = ""
      else {
        // move the segment (incl. its leading '/', excl. the next '/')
        val from = if (in.charAt(0) == '/') 1 else 0
        val nextSlash = in.indexOf('/', from)
        val end = if (nextSlash < 0) in.length else nextSlash
        out.append(in, 0, end)
        in = in.substring(end)
      }
    }
    out.toString
  }

  /** Full canonicalization; null when there is no `scheme://host`. */
  def canonicalize(url: String): String = {
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    var authEnd = rest.length
    var i = 0
    while (i < authEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { authEnd = i }
      else i += 1
    }
    val authority = rest.substring(0, authEnd)
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    // the port colon must sit after any IPv6 bracket (the literal's own
    // colons never end in an all-digit tail past ']'), with a non-empty
    // all-digit tail — anything else is part of the host
    val bracketEnd = hostPort.lastIndexOf(']')
    val (hostRaw, portRaw) =
      if (colon > bracketEnd && colon >= 0 &&
        colon + 1 < hostPort.length &&
        hostPort.substring(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val host = hostRaw.toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return null
    val port =
      if (portRaw.isEmpty) ""
      else if (scheme == "http" && portRaw == "80") ""
      else if (scheme == "https" && portRaw == "443") ""
      else ":" + portRaw
    var tail = rest.substring(authEnd)
    val hash = tail.indexOf('#')
    if (hash >= 0) tail = tail.substring(0, hash) // drop fragment
    val q = tail.indexOf('?')
    val pathRaw = if (q >= 0) tail.substring(0, q) else tail
    val queryRaw = if (q >= 0) tail.substring(q + 1) else null
    val path = {
      val p = removeDotSegments(pctNormalize(pathRaw))
      if (p.isEmpty) "/" else p
    }
    val query =
      if (queryRaw == null) ""
      else {
        val params = pctNormalize(queryRaw).split("&", -1)
          .filter(_.nonEmpty).sorted
        if (params.isEmpty) "" else "?" + params.mkString("&")
      }
    scheme + "://" + userinfo + host + port + path + query
  }
}
