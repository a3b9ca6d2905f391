package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")

  test("tokenCountWs: whitespace runs, empty string") {
    assert(one[Long](Text.tokenCountWs(col("text")), "a  b\tc\nd") === 4L)
    assert(one[Long](Text.tokenCountWs(col("text")), "") === 0L)
    assert(one[Long](Text.tokenCountWs(col("text")), "   ") === 0L)
  }

  test("tokenCountBpe: ~4 chars per word-token plus punctuation") {
    // "hello" → 2, "world" → 2, "," and "!" → 1 each
    assert(one[Long](Text.tokenCountBpe(col("text")), "hello, world!") === 6L)
    assert(one[Long](Text.tokenCountBpe(col("text")), "") === 0L)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String](Text.langId(col("text")),
      "the cat is in the house and it is warm") === "en")
    assert(one[String](Text.langId(col("text")),
      "le chat est dans la maison et la nuit") === "fr")
    assert(one[String](Text.langId(col("text")), "xyzzy qwerty") === "und")
  }

  test("fingerprint is invariant to case and whitespace, distinct for different text") {
    val f1 = one[Long](Text.fingerprint(col("text")), "Hello   World")
    val f2 = one[Long](Text.fingerprint(col("text")), "hello world")
    val f3 = one[Long](Text.fingerprint(col("text")), "hello worlds")
    assert(f1 === f2)
    assert(f1 !== f3)
  }

  test("shingles: n-grams distinct; short text collapses to whole-text shingle") {
    val sh = one[collection.Seq[String]](Text.shingles(col("text"), 3), "a b c d")
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = one[collection.Seq[String]](Text.shingles(col("text"), 3), "a b")
    assert(short.toSeq === Seq("a b"))
  }

  test("winnow: sorted distinct selection; shared run of k+w-1 words ⇒ common hash") {
    def fp(t: String) =
      one[collection.Seq[Long]](Text.winnow(col("text"), k = 3, w = 3), t).toSeq
    val a = fp("the quick brown fox jumps over the lazy dog tonight")
    assert(a === a.sorted && a.distinct === a, "selection must be sorted distinct")
    // winnowing guarantee (Schleimer et al. §3): two docs sharing a
    // run of ≥ k+w-1 = 5 words select at least one common hash, no
    // matter what surrounds the run
    val shared = "quick brown fox jumps over"
    val b = fp(s"completely different prefix $shared and another ending here")
    assert(a.toSet.intersect(b.toSet).nonEmpty, "shared run must yield a common hash")
    // disjoint vocabularies share nothing
    val c = fp("uno dos tres cuatro cinco seis siete ocho nueve diez")
    assert(a.toSet.intersect(c.toSet).isEmpty)
    // short text (< k words) degrades to the whole-text shingle hash
    assert(fp("a b").length === 1)
  }
}
