package graft.crawl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP status-code → canonical label mapping (F10), matching the
  * reference's `map_status_code` (reference:
  * page_loader/src/http/http_utils.rs:14-41): the standard IANA reason
  * phrase when one exists (hyper's `canonical_reason`), the unofficial
  * Cloudflare 520–527 labels, else "Unknown Status Code".
  *
  * Exposed as a literal map column — `element_at` on a literal stays inside
  * whole-stage codegen; no UDF, no broadcast needed for a ~70-entry map.
  */
object StatusCodes {

  val Unknown = "Unknown Status Code"

  /** IANA reason phrases as hyper publishes them (public registry). */
  val labels: Map[Int, String] = Map(
    100 -> "Continue", 101 -> "Switching Protocols", 102 -> "Processing",
    103 -> "Early Hints",
    200 -> "OK", 201 -> "Created", 202 -> "Accepted",
    203 -> "Non-Authoritative Information", 204 -> "No Content",
    205 -> "Reset Content", 206 -> "Partial Content", 207 -> "Multi-Status",
    208 -> "Already Reported", 226 -> "IM Used",
    300 -> "Multiple Choices", 301 -> "Moved Permanently", 302 -> "Found",
    303 -> "See Other", 304 -> "Not Modified", 305 -> "Use Proxy",
    307 -> "Temporary Redirect", 308 -> "Permanent Redirect",
    400 -> "Bad Request", 401 -> "Unauthorized", 402 -> "Payment Required",
    403 -> "Forbidden", 404 -> "Not Found", 405 -> "Method Not Allowed",
    406 -> "Not Acceptable", 407 -> "Proxy Authentication Required",
    408 -> "Request Timeout", 409 -> "Conflict", 410 -> "Gone",
    411 -> "Length Required", 412 -> "Precondition Failed",
    413 -> "Payload Too Large", 414 -> "URI Too Long",
    415 -> "Unsupported Media Type", 416 -> "Range Not Satisfiable",
    417 -> "Expectation Failed", 418 -> "I'm a teapot",
    421 -> "Misdirected Request", 422 -> "Unprocessable Entity",
    423 -> "Locked", 424 -> "Failed Dependency", 425 -> "Too Early",
    426 -> "Upgrade Required",
    428 -> "Precondition Required", 429 -> "Too Many Requests",
    431 -> "Request Header Fields Too Large",
    451 -> "Unavailable For Legal Reasons",
    500 -> "Internal Server Error", 501 -> "Not Implemented",
    502 -> "Bad Gateway", 503 -> "Service Unavailable",
    504 -> "Gateway Timeout", 505 -> "HTTP Version Not Supported",
    506 -> "Variant Also Negotiates", 507 -> "Insufficient Storage",
    508 -> "Loop Detected", 510 -> "Not Extended",
    511 -> "Network Authentication Required",
    // unofficial Cloudflare labels (http_utils.rs:16-24)
    520 -> "[CLOUDFLARE] Web Server Returned an Unknown Error",
    521 -> "[CLOUDFLARE] Web Server Is Down",
    522 -> "[CLOUDFLARE] Connection Timed Out",
    523 -> "[CLOUDFLARE] Origin Is Unreachable",
    524 -> "[CLOUDFLARE] A Timeout Occurred",
    525 -> "[CLOUDFLARE] SSL Handshake Failed",
    526 -> "[CLOUDFLARE] Invalid SSL Certificate",
    527 -> "[CLOUDFLARE] Railgun Error")

  def label(code: Int): String = labels.getOrElse(code, Unknown)

  private lazy val mapCol: Column = typedlit(labels)

  /** Label column for a code column; null when `code` < 0 (no HTTP exchange
    * happened — status/connection-error rows carry no label). Any
    * non-negative code labels exactly like [[label]] — including sub-100
    * oddballs, which map to [[Unknown]], matching the reference's
    * `map_status_code` fall-through (and the SimCrawler oracle). */
  def labelCol(code: Column): Column =
    when(code >= 0, coalesce(element_at(mapCol, code), lit(Unknown)))
      .otherwise(lit(null).cast("string"))
}
