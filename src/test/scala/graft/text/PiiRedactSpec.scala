package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Redaction behavior on planted PII fixtures (the corpus itself is
  * synthetic lowercase prose, so the declared query's oracle proves
  * cross-engine parity while this spec proves the patterns actually
  * catch PII shapes). */
class PiiRedactSpec extends SparkSpec {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(PiiRedact.redact(col("t"))).head().getString(0)
  }

  test("emails are redacted, including dots/plus tags in the local part") {
    assert(redactOne("contact alice.smith+spam@example.co.uk today") ==
      "contact <EMAIL> today")
    assert(redactOne("a@b.io and c_d%e@f-g.org") == "<EMAIL> and <EMAIL>")
  }

  test("phone-shaped digit runs are redacted") {
    assert(redactOne("call 555-867-5309 now") == "call <PHONE> now")
    assert(redactOne("intl +358 4012 3456") == "intl <PHONE>")
    assert(redactOne("dotted 555.867.5309") == "dotted <PHONE>")
  }

  test("plain prose and bare numbers pass through untouched") {
    val s = "the cat sat on 42 mats in 2024"
    assert(redactOne(s) == s)
  }

  test("mixed PII in one document") {
    assert(redactOne("bob@corp.com / 415-555-0199") == "<EMAIL> / <PHONE>")
  }
}
