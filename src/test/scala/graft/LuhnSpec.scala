package graft

import graft.functions.{LuhnImpl, Pii}
import org.apache.spark.sql.functions._

class LuhnSpec extends SparkSuite {
  import spark.implicits._

  private def scan(text: String): (Int, Int, String) = {
    val r = Seq(text).toDF("t")
      .select(Pii.cardCandidates(col("t")).as("c"),
        Pii.cardsValid(col("t")).as("v"),
        Pii.redactCards(col("t")).as("r"))
      .collect()(0)
    (r.getInt(0), r.getInt(1), r.getString(2))
  }

  test("luhnOk: textbook vectors") {
    assert(LuhnImpl.luhnOk("4111111111111111"))   // the VISA test PAN
    assert(!LuhnImpl.luhnOk("4111111111111112"))
    assert(LuhnImpl.luhnOk("79927398713"))        // Luhn's own example
    assert(!LuhnImpl.luhnOk("79927398714"))
    assert(LuhnImpl.luhnOk("378282246310005"))    // 15-digit Amex PAN
    assert(LuhnImpl.luhnOk("6011111111111117"))   // 16-digit Discover
    assert(LuhnImpl.luhnOk("0"))                  // degenerate: 0 ≡ 0 mod 10
  }

  test("candidate grammar: 13–19 digit runs, single space/dash separators") {
    assert(scan("pay 4111111111111111 now") === (1, 1, "pay <CARD> now"))
    // separators inside the run
    assert(scan("4111 1111 1111 1111") === (1, 1, "<CARD>"))
    assert(scan("4111-1111-1111-1111") === (1, 1, "<CARD>"))
    assert(scan("4111 1111-1111 1111") === (1, 1, "<CARD>"))
    // 12 digits: not a candidate even though Luhn holds
    assert(LuhnImpl.luhnOk("411111111117"))
    assert(scan("ref 411111111117") === (0, 0, "ref 411111111117"))
    // over-long maximal run rejected whole, never re-segmented
    assert(scan("id 41111111111111110000") === (0, 0, "id 41111111111111110000"))
    // double separator splits runs (neither half is a candidate)
    assert(scan("4111  1111 1111 1111") === (0, 0, "4111  1111 1111 1111"))
    assert(scan("4111--1111-1111-1111") === (0, 0, "4111--1111-1111-1111"))
  }

  test("valid vs candidate: checksum gates the redaction") {
    // an invalid 16-digit run is a candidate but never redacted
    assert(scan("x 4111111111111112 y") === (1, 0, "x 4111111111111112 y"))
    // two cards, one valid: only the valid one goes
    assert(scan("a 4111111111111111 b 4111111111111112 c")
      === (2, 1, "a <CARD> b 4111111111111112 c"))
    // adjacent text and punctuation survive byte-for-byte
    assert(scan("(4111111111111111).") === (1, 1, "(<CARD>)."))
    assert(scan("") === (0, 0, ""))
  }

  test("null-safe through the codegen'd path") {
    val r = Seq((1L, Option.empty[String]), (2L, Some("4111111111111111")))
      .toDF("id", "t")
      .select(col("id"), Pii.cardsValid(col("t")).as("v"),
        Pii.redactCards(col("t")).as("r"))
      .orderBy(col("id")).collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(r(1).getInt(1) === 1 && r(1).getString(2) === "<CARD>")
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("a 4111 1111 1111 1111 b 123 c 79927398713 d")
    // 11-digit run is not a candidate; the spaced 16-digit run is
    assert(LuhnImpl.candidateCount(s) === 1)
    assert(LuhnImpl.validCount(s) === 1)
    assert(LuhnImpl.redact(s).toString === "a <CARD> b 123 c 79927398713 d")
  }
}
