package graft

/** Memoized per-JVM index STORES for graded probe keys.
  *
  * A maintained-index key grades (and times) the PROBE against a
  * persisted index — that is its production semantics: the index is
  * long-lived state built once per corpus version, while queries run
  * all day (r12 verdict ask #4). Rebuilding and re-WRITING the index
  * inside every timed pass graded build+write+probe instead — the
  * very conflation the ask was about (measured: the r13 store-hop
  * first cut made doc_phrase_search 2.0x its pin because each timed
  * pass paid the parquet write).
  *
  * [[cached]] builds a store once per (key, JVM) and hands every
  * subsequent caller the same path — Bench's untimed warmup pass
  * builds it, the timed passes read it, and the BUILD cost is graded
  * where it belongs (its own key, e.g. doc_phrase_index_build).
  * Correctness is unaffected: every memoized store is a pure
  * deterministic function of the input dir baked into the key, and
  * Verify gets identical bytes whether it builds or reuses. Backed by
  * [[TempDirs]], so stores are reclaimed at JVM exit.
  */
object Stores {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val buildSec =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Return the store path for `key`, building it first via
    * `build(dir)` if this JVM hasn't yet. `build` must be
    * deterministic in `key` — the path is shared by all callers.
    */
  def cached(key: String)(build: String => Unit): String =
    built.computeIfAbsent(key, _ => {
      val dir = TempDirs.create("graft_store_")
      val t0 = System.nanoTime()
      build(dir)
      // Stamp the build cost so a build regression is visible in the
      // bench artifact the round it happens, not only when it crosses
      // the dedicated build key's pin (r13 verdict ask #5). First
      // build in the JVM wins — that is the cost a fresh cluster pays.
      buildSec.putIfAbsent(key, (System.nanoTime() - t0) / 1e9)
      dir
    })

  /** Per-store build seconds observed in this JVM, for Bench's
    * `store_build_sec` artifact field. Empty until a store is built.
    */
  def buildSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSec.asScala.toMap
  }
}
