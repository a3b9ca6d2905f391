package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-registry shard 7 — the r14 wave (RegistrySpec's shard-size
  * ceiling means a new wave opens a new shard instead of appending).
  * [[SparkEntry.queries]] composes the shards. */
private[graft] object QueriesShard7 {

  /** Learned BPE merge table for the corpus at `d`, memoized as a
    * per-JVM store (the posidx discipline): the vocabulary is
    * long-lived state learned once per corpus version while encode
    * jobs run all day — the learning cost is graded by its own key
    * (corpus_bpe, the same learnMerges call), the encode keys time
    * the APPLICATION. The table is bounded (numMerges rows), so the
    * probe-side collect is a bounded-scalar pull, not a driver loop.
    */
  private def bpeMerges(s: SparkSession, d: String): Seq[(String, String)] = {
    val store = graft.Stores.cached(s"bpe_merges:$d") { dir =>
      functions.Bpe.learnMerges(Tables.documents(s, d), "doc_id", "text",
          numMerges = 30)
        .write.parquet(dir + "/t")
    } + "/t"
    s.read.parquet(store).orderBy(col("merge_no")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  val m: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- FT-checkpoint connected components (r13 verdict ask #8) ----
    // the reliable=true variant swaps eager localCheckpoint (blocks
    // pinned to executors — lost on executor death) for the
    // HDFS-backed checkpoint() a dynamic-allocation cluster needs;
    // the labeling must be IDENTICAL, so it grades against the
    // dedup_components recursive-reachability oracle verbatim
    "dedup_components_reliable" -> ((s, d) => {
      if (s.sparkContext.getCheckpointDir.isEmpty)
        s.sparkContext.setCheckpointDir(graft.TempDirs.create("graft_ckpt_"))
      Dedup.connectedComponents(
          Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text",
            n = 3, threshold = 0.5, maxDocFreq = 1000),
          reliable = true)
        .orderBy(col("id"))
    }),

    // ---- serial FFD exact twin (r13 verdict ask #7) ----
    // doc_pack's bin ids depend on the partition layout (each task
    // packs its slice), so the DISTRIBUTED key is rows-only by
    // design. This twin pins the FFD algorithm itself hash-exactly:
    // one partition, unbounded open bins, deterministic
    // (tokens desc, id asc) order — the DuckDB oracle replays the
    // identical first-fit-decreasing fold as a recursive CTE over
    // the same BPE-proxy token counts, so bin ids, slots, and
    // remaining-capacity arithmetic all grade bit-for-bit. The
    // distributed form is the 100 TB path; this twin is its
    // algorithm gate.
    "doc_pack_serial" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        functions.Text.tokenCountBpe(col("text")).as("n_tokens"))
      Pack.firstFit(docs.coalesce(1), "doc_id", "n_tokens",
          binTokens = 2048L, maxOpenBins = Int.MaxValue,
          widenInput = false)
        .orderBy(col("doc_id"))
    }),

    // ---- Misra–Gries presence-guarantee gate (r13 verdict ask #7) ----
    // corpus_top_terms_approx's count_min values are partition-
    // layout-dependent (rows-only by design), but the sketch's
    // PRESENCE guarantee is exact: every term with true count
    // > N/(capacity+1) is in the merged summary (Misra & Gries '82;
    // mergeability per Agarwal et al.). This key runs the sketch,
    // semi-joins the exact heavy-hitter set against the summary
    // terms, and emits the survivors with their EXACT counts — by
    // the guarantee the output equals the heavy set, which is plain
    // SQL. A sketch bug that drops a heavy term hash-fails the key.
    "corpus_top_terms_guarantee" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val capacity = 256
      val summary = functions.Text.topTermsApprox(docs, "doc_id", "text",
        k = capacity, capacity = capacity).select(col("term"))
      val words = docs.select(
          explode(split(functions.Text.normalize(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val total = words.agg(count(lit(1)).as("__n"))
      val heavy = words.groupBy(col("term"))
        .agg(count(lit(1)).as("true_count"))
        .crossJoin(broadcast(total)) // one row
        .filter(col("true_count") * (capacity + 1) > col("__n"))
      heavy.join(summary, Seq("term"), "left_semi")
        .select(col("term"), col("true_count"))
        .orderBy(col("term"))
    }),

    // ---- BPE encode over the corpus (r13 verdict ask #3) ----
    // corpus_bpe learns merges; this key APPLIES them corpus-wide —
    // the tokenize hop every training-data pipeline actually runs.
    // Per-doc output: whitespace word count + the BPE token count
    // after greedy merge application in learned order. The merge
    // table rides the memoized store (build graded by corpus_bpe's
    // own key); the encode itself is a per-row codegen'd fold —
    // zero shuffle, scan-speed at 100 TB. Token counts depend on
    // the LEARNED table (not SQL-stateable) → rows-only; BpeSpec
    // pins encode semantics on a hand-computed corpus and the
    // invariants (merge count monotonicity, char conservation).
    "corpus_bpe_encode" -> ((s, d) => {
      val merges = bpeMerges(s, d)
      Tables.documents(s, d)
        .select(col("doc_id"),
          functions.Bpe.encode(col("text"), merges).as("__toks"))
        .select(col("doc_id"),
          size(col("__toks")).as("n_words"),
          aggregate(col("__toks"), lit(0L),
            (acc, w) => acc + size(w)).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- tokenize→pack composition (r13 verdict ask #3) ----
    // the full curation→tokenize→pack chain as ONE graded pipeline:
    // BPE-encode the corpus with the learned merges, then FFD-pack
    // the resulting token counts into 2048-token bins. Bin ids are
    // partition-layout-dependent (the doc_pack contract) → rows-only;
    // PackSpec pins the FFD invariants (capacity, slot density,
    // per-bin conservation) on the composed pipeline and
    // doc_pack_serial hash-grades the packing algorithm itself.
    "doc_pack_bpe" -> ((s, d) => {
      val merges = bpeMerges(s, d)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          functions.Bpe.encode(col("text"), merges).as("__toks"))
        .select(col("doc_id"),
          aggregate(col("__toks"), lit(0L),
            (acc, w) => acc + size(w)).as("n_tokens"))
      Pack.firstFit(toks, "doc_id", "n_tokens", binTokens = 2048L)
        .orderBy(col("doc_id"))
    }),
  )
}
