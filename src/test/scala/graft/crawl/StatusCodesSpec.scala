package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins labelCol (the codegen'd column form) to label() (the scala form the
  * SimCrawler oracle uses) for every code either side can see — including
  * sub-100 oddballs, which must label as Unknown on BOTH sides rather than
  * diverging (null vs Unknown). */
class StatusCodesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("labelCol == label() for all codes >= 0; null below 0") {
    val got = (-2 to 600).toDF("code")
      .select(col("code"), StatusCodes.labelCol(col("code")).as("l"))
      .as[(Int, Option[String])].collect()
    got.foreach { case (c, l) =>
      if (c < 0) assert(l.isEmpty, s"code $c must label null")
      else assert(l.contains(StatusCodes.label(c)), s"code $c: $l")
    }
    assert(StatusCodes.label(99) == StatusCodes.Unknown)
    assert(StatusCodes.label(523) == "[CLOUDFLARE] Origin Is Unreachable")
    // hyper/http-0.2.5 canonical_reason parity spot-checks
    assert(StatusCodes.label(203) == "Non-Authoritative Information")
    assert(StatusCodes.label(425) == "Too Early")
    assert(StatusCodes.label(103) == "Early Hints")
  }
}
