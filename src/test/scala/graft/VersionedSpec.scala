package graft

import graft.sources.Versioned
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSuite {
  import spark.implicits._

  test("commit/read: replace swaps atomically, append accumulates, reads pin") {
    val dir = tmpDir("ver") + "/t"
    val v1 = Versioned.commit((1L to 100L).toDF("id"), dir, replace = true)
    assert(v1 === 1)
    assert(Versioned.read(spark, dir).count() === 100)

    val v2 = Versioned.commit((101L to 150L).toDF("id"), dir) // append
    assert(v2 === 2)
    assert(Versioned.read(spark, dir).count() === 150)
    // time travel: v1 still reads exactly its own data
    assert(Versioned.read(spark, dir, Some(1)).count() === 100)

    val v3 = Versioned.commit((1L to 10L).toDF("id"), dir, replace = true)
    assert(v3 === 3)
    assert(Versioned.read(spark, dir).count() === 10)
    assert(Versioned.read(spark, dir, Some(2)).agg(sum("id")).head.getLong(0)
      === (1L to 150L).sum)
  }

  test("a crashed write (segment without manifest) is invisible") {
    val dir = tmpDir("verc") + "/t"
    Versioned.commit((1L to 50L).toDF("id"), dir, replace = true)
    // simulate a writer dying after its data write, before commit
    (999L to 1000L).toDF("id").write
      .parquet(dir + "/d-crashed-0000")
    assert(Versioned.read(spark, dir).count() === 50)
    // the next commit is unaffected and still doesn't see the orphan
    Versioned.commit((51L to 60L).toDF("id"), dir)
    assert(Versioned.read(spark, dir).count() === 60)
    // vacuum reclaims the orphan — but only past the retention window
    // (a young unreferenced segment may be a commit in flight)
    assert(Versioned.vacuum(spark, dir, keepVersions = 2) === 0)
    assert(Versioned.read(spark, dir).count() === 60)
    assert(Versioned.vacuum(spark, dir, keepVersions = 2, retentionMs = 0L) >= 1)
    assert(Versioned.read(spark, dir).count() === 60)
  }

  test("losing the version CAS retries onto the next head") {
    val dir = tmpDir("verr") + "/t"
    Versioned.commit((1L to 20L).toDF("id"), dir, replace = true)
    // occupy v2 by hand — as a racing committer would
    val vdir = new java.io.File(dir.stripPrefix("file:"), "_versions")
    val squatter = new java.io.File(vdir, "v00000002.json")
    val w = new java.io.FileWriter(squatter)
    w.write("""{"version":2,"segments":[]}"""); w.close()
    val v = Versioned.commit((21L to 30L).toDF("id"), dir)
    assert(v === 3, "commit must retry past the occupied version")
    // the head (v3) appended onto the state the RETRY saw — v2's
    // segment list (empty here), plus the new segment
    assert(Versioned.read(spark, dir).count() === 10)
    assert(Versioned.read(spark, dir, Some(1)).count() === 20)
  }

  test("upsert commits merged state; history stays queryable") {
    val dir = tmpDir("veru") + "/t"
    def batch(rows: (Long, String, Long)*) =
      rows.toSeq.toDF("k", "v", "ver")
    assert(Versioned.upsert(batch((1L, "a", 1L), (2L, "b", 1L)),
      dir, Seq("k"), "ver") === 1)
    // update key 2, insert key 3 — latest-wins within the batch too
    assert(Versioned.upsert(
      batch((2L, "b2", 2L), (2L, "b1", 1L), (3L, "c", 2L)),
      dir, Seq("k"), "ver") === 2)
    val head = Versioned.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(head === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // time travel to the pre-upsert table
    val v1 = Versioned.read(spark, dir, Some(1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 === Map(1L -> "a", 2L -> "b"))
  }

  test("replace-commit rebases onto a head moved mid-merge (no lost update)") {
    val dir = tmpDir("verlu") + "/t"
    Versioned.commit((1L to 10L).toDF("id"), dir, replace = true) // v1
    // stateOf observes head=1; before its CAS lands, an interloper
    // commits v2 (the concurrent-writer window from ADVICE r7) — the
    // first CAS must lose and the retry must re-derive from v2, so
    // the interloper's row survives in the final head.
    var interleaved = false
    val v = Versioned.commitRebase(spark, dir, maxRetries = 5) { head =>
      val base = Versioned.read(spark, dir, Some(head))
      if (!interleaved) {
        interleaved = true
        Versioned.commit(Seq(100L).toDF("id"), dir) // racing append wins v2
      }
      base.union(Seq(999L).toDF("id"))
    }
    assert(v === 3)
    val ids = Versioned.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids.contains(100L), "concurrent writer's row must not be lost")
    assert(ids.contains(999L) && ids.contains(10L))
    assert(ids.size === 12)
  }

  test("compact folds append segments into one; history intact until vacuum") {
    val dir = tmpDir("vercp") + "/t"
    Versioned.commit((1L to 10L).toDF("id"), dir, replace = true)
    Versioned.commit((11L to 20L).toDF("id"), dir)
    Versioned.commit((21L to 30L).toDF("id"), dir)
    val v = Versioned.compact(spark, dir)
    assert(v === 4)
    val segs = new java.io.File(dir.stripPrefix("file:")).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("d-"))
    assert(segs === 4, "pre-compaction segments remain until vacuum")
    assert(Versioned.read(spark, dir).count() === 30)
    assert(Versioned.read(spark, dir, Some(2)).count() === 20) // time travel intact
    Versioned.vacuum(spark, dir, keepVersions = 1, retentionMs = 0L)
    val after = new java.io.File(dir.stripPrefix("file:")).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("d-"))
    assert(after === 1 && Versioned.read(spark, dir).count() === 30)
  }

  test("vacuum keeps referenced segments, drops superseded versions") {
    val dir = tmpDir("verv") + "/t"
    Versioned.commit((1L to 30L).toDF("id"), dir, replace = true)   // v1
    Versioned.commit((31L to 40L).toDF("id"), dir)                  // v2 = v1+delta
    Versioned.commit((1L to 5L).toDF("id"), dir, replace = true)    // v3 fresh
    val removed = Versioned.vacuum(spark, dir, keepVersions = 1, retentionMs = 0L)
    assert(removed === 2, s"expected v1's and v2's dead segments, got $removed")
    assert(Versioned.read(spark, dir).count() === 5)
    // superseded manifests are gone → time travel to them now fails
    intercept[Exception](Versioned.read(spark, dir, Some(1)).count())
  }
}
