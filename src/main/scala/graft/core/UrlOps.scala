package graft.core

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** URL normalization — the reference's one genuinely custom scalar
  * (`etl_merge.py:474-514`, SURVEY §2 F1). Semantics mirrored branch by
  * branch against Python's urlparse/parse_qsl/urlencode behavior:
  *
  *  - trim; path-only input ("/x") gets `siteBase` prefixed when configured;
  *  - scheme and host lowercased (urlparse lowercases scheme; the reference
  *    lowercases netloc), path case preserved;
  *  - fragment always dropped;
  *  - query params: utm_* keys dropped (case-insensitive prefix), blank
  *    values kept, survivors re-encoded in order with quote_plus rules
  *    (space→'+', unreserved [A-Za-z0-9_.~-] verbatim, rest %XX);
  *  - optionally strip ALL params;
  *  - trailing path slash stripped except for root "/";
  *  - unparseable input returned as-is.
  *
  * Exposed as a Scala UDF: the logic needs real string scanning that
  * composed built-ins (`parse_url` + `regexp_replace`) cannot reproduce
  * faithfully (param re-encoding, blank-value keeps). The UDF is a pure
  * deterministic String→String function, so it stays narrow in the plan:
  * apply it once, project, and every surrounding op still codegens.
  */
object UrlOps {

  private val Unreserved: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet ++ Set('_', '.', '-', '~')

  /** Python urllib.parse.quote_plus(s, safe=''). */
  def quotePlus(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c == ' ') sb.append('+')
      else if (Unreserved(c)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Python urllib.parse.unquote_plus: '+'→' ', %XX decoded (bad escapes
    * passed through, like Python). Operates on the UTF-8 BYTES — a per-char
    * pass would shred surrogate pairs (non-BMP input) into replacement
    * bytes; '%', '+' and hex digits are all single-byte ASCII, so byte-level
    * scanning is exact.
    */
  def unquotePlus(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '%'.toByte && i + 2 < bytes.length &&
        isHex(bytes(i + 1).toChar) && isHex(bytes(i + 2).toChar)) {
        out.write(Integer.parseInt(
          new String(bytes, i + 1, 2, StandardCharsets.US_ASCII), 16))
        i += 3
      } else if (b == '+'.toByte) {
        out.write(' '.toInt)
        i += 1
      } else {
        out.write(b.toInt)
        i += 1
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Python urllib.parse.parse_qsl(query, keep_blank_values=True). */
  def parseQsl(query: String): Seq[(String, String)] =
    query.split("&", -1).toSeq.filter(_.nonEmpty).map { field =>
      field.indexOf('=') match {
        case -1 => (unquotePlus(field), "")
        case i => (unquotePlus(field.substring(0, i)), unquotePlus(field.substring(i + 1)))
      }
    }

  /** Python urllib.parse.urlencode over (k,v) pairs. */
  def urlencode(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => s"${quotePlus(k)}=${quotePlus(v)}" }.mkString("&")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):(.*)$".r

  /** url_normalize(u) with explicit config (the reference reads SITE_BASE /
    * STRIP_ALL_QUERY_PARAMS from the environment at call time; the engine
    * takes them as parameters and closes over them at plan time).
    */
  def normalize(u0: String, siteBase: String, stripAllParams: Boolean): String = {
    if (u0 == null || u0.isEmpty) return u0
    var u = u0.trim
    if (u.startsWith("/") && siteBase != null && siteBase.trim.nonEmpty) {
      u = siteBase.trim.replaceAll("/+$", "") + u
    }
    try {
      // fragment: everything after the first '#' is dropped
      val hashIdx = u.indexOf('#')
      var rest = if (hashIdx >= 0) u.substring(0, hashIdx) else u
      // scheme (urlparse: lowercased; only when ':' precedes any '/')
      var scheme = ""
      rest match {
        case SchemeRe(s, r) if !s.contains("/") => scheme = s.toLowerCase; rest = r
        case _ =>
      }
      // netloc: present only after "//"
      var netloc = ""
      if (rest.startsWith("//")) {
        val after = rest.substring(2)
        val end = after.indexWhere(c => c == '/' || c == '?')
        if (end == -1) { netloc = after; rest = "" }
        else { netloc = after.substring(0, end); rest = after.substring(end) }
      }
      netloc = netloc.toLowerCase
      // query
      var query = ""
      val qIdx = rest.indexOf('?')
      var path = rest
      if (qIdx >= 0) { query = rest.substring(qIdx + 1); path = rest.substring(0, qIdx) }
      // params: urlparse splits ';' params off the LAST path segment
      var params = ""
      val lastSlash = path.lastIndexOf('/')
      val lastSeg = path.substring(lastSlash + 1)
      val semiIdx = lastSeg.indexOf(';')
      if (semiIdx >= 0) {
        params = lastSeg.substring(semiIdx + 1)
        path = path.substring(0, lastSlash + 1) + lastSeg.substring(0, semiIdx)
      }
      // query handling
      query =
        if (stripAllParams) ""
        else urlencode(parseQsl(query).filterNot(_._1.toLowerCase.startsWith("utm_")))
      // trailing slash (except root)
      if (path != "/" && path.endsWith("/")) path = path.dropRight(1)
      // urlunparse
      val sb = new StringBuilder
      if (scheme.nonEmpty) sb.append(scheme).append(':')
      if (netloc.nonEmpty || u.startsWith("//")) sb.append("//").append(netloc)
      sb.append(path)
      if (params.nonEmpty) sb.append(';').append(params)
      if (query.nonEmpty) sb.append('?').append(query)
      sb.toString
    } catch {
      case _: Exception => u
    }
  }

  /** UTF8String-level entry point called from the expression's generated
    * code (graft.functions.UrlNormalize#doGenCode) via this object's static
    * forwarder — keeps the enclosing stage in whole-stage codegen while the
    * branchy normalization itself runs as compiled Scala. `normalize` never
    * returns null for non-null input, so the result is always non-null.
    */
  def normalizeU8(u: UTF8String, siteBase: String, stripAllParams: Boolean): UTF8String =
    UTF8String.fromString(normalize(u.toString, siteBase, stripAllParams))

  /** Column form: the native expression tier (graft.functions.UrlNormalize)
    * with the config baked in as plan-time constants. Deterministic and
    * null-tolerant; semantics pinned branch-by-branch in UrlOpsSpec.
    */
  def urlNormalize(c: Column, siteBase: String = "", stripAllParams: Boolean = false): Column =
    graft.functions.UrlNormalize.urlNormalize(c, siteBase, stripAllParams)

  /** `looks_url_like` predicate (`etl_merge.py:165-172`, SURVEY §2 C1):
    * trimmed+lowercased value starts with http://, https:// or '/'.
    * Pure Column expression — codegen-friendly, pushdown-eligible.
    */
  def looksUrlLike(c: Column): Column = {
    val s = lower(trim(c))
    c.isNotNull && (s.startsWith("http://") || s.startsWith("https://") || s.startsWith("/"))
  }
}
