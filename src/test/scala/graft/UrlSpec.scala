package graft

import graft.functions.Url
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSuite {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Url.canonicalize(col("u")).as("c"))
      .collect()(0).getString(0)

  test("canonicalize: each RFC 3986 rule + the tracking strip, hand-computed") {
    // scheme + host lowercase; path case preserved
    assert(canon("HTTPS://WWW.Ex.COM/Docs/A") === "https://www.ex.com/Docs/A")
    // default port dropped under its OWN scheme only
    assert(canon("https://ex.com:443/a") === "https://ex.com/a")
    assert(canon("http://ex.com:80/a") === "http://ex.com/a")
    assert(canon("http://ex.com:443/a") === "http://ex.com:443/a")
    assert(canon("https://ex.com:8080/a") === "https://ex.com:8080/a")
    // fragment dropped
    assert(canon("https://ex.com/a#sec") === "https://ex.com/a")
    // tracking params dropped, survivors sorted, empty query loses '?'
    assert(canon("https://ex.com/a?utm_source=f&b=2&a=1")
      === "https://ex.com/a?a=1&b=2")
    assert(canon("https://ex.com/a?fbclid=x&gclid=y&ref=h") === "https://ex.com/a")
    assert(canon("https://ex.com/a?b=2&a=1") === "https://ex.com/a?a=1&b=2")
    // one trailing slash stripped on non-root; empty path becomes root
    assert(canon("https://ex.com/a/") === "https://ex.com/a")
    assert(canon("https://ex.com/") === "https://ex.com/")
    assert(canon("https://ex.com") === "https://ex.com/")
  }

  test("canonicalize is idempotent over the synthesized corpus") {
    val urls = spark.range(0, 500)
      .select(concat(lit("src"), (col("id") % 20).cast("string")).as("source"),
        col("id"))
      .select(Url.synthesize(col("source"), col("id")).as("u"))
    val twice = urls.select(col("u"),
        Url.canonicalize(col("u")).as("c1"))
      .select(col("c1"), Url.canonicalize(col("c1")).as("c2"))
    assert(twice.filter(col("c1") =!= col("c2")).count() === 0L)
  }

  test("synthesize exercises every rule and collides post-canon") {
    val df = spark.range(0, 500)
      .select(concat(lit("src"), (col("id") % 20).cast("string")).as("source"),
        col("id"))
      .select(col("id"), Url.synthesize(col("source"), col("id")).as("u"))
      .select(col("id"), col("u"), Url.canonicalize(col("u")).as("c"))
    val rows = df.collect()
    // raw corpus carries the noise the canonicalizer must erase
    assert(rows.exists(_.getString(1).contains("HTTPS://")))
    assert(rows.exists(_.getString(1).contains(":443")))
    assert(rows.exists(_.getString(1).contains(":8080")))
    assert(rows.exists(_.getString(1).contains("#Section2")))
    assert(rows.exists(_.getString(1).contains("utm_")))
    // canon corpus: no noise survives; kept port DOES survive
    assert(rows.forall(r => !r.getString(2).contains("#")))
    assert(rows.forall(r => !r.getString(2).contains("utm_")))
    assert(rows.forall(r => !r.getString(2).contains(":443")))
    assert(rows.exists(r => r.getString(2).contains(":8080")))
    // real merges: strictly fewer canon forms than raw forms
    val nRaw = rows.map(_.getString(1)).distinct.length
    val nCanon = rows.map(_.getString(2)).distinct.length
    assert(nCanon < nRaw, s"no post-canon collisions (raw=$nRaw canon=$nCanon)")
  }

  test("domain strips one leading www. from the lowercased host") {
    val d = Seq("HTTPS://WWW.Sub.Ex.COM/a", "https://ex.com/b",
        "https://wwwx.ex.com/c")
      .toDF("u").select(Url.domain(col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(d === Seq("sub.ex.com", "ex.com", "wwwx.ex.com"))
  }
}
