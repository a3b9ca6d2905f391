package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed token-budget bins
  * (LLM pre-training batches pack many short documents into one
  * context window; unpacked batches waste the padding). Bin packing
  * is inherently sequential, so the scalable form is PARTITION-LOCAL
  * greedy first-fit-decreasing: each task packs only its slice
  * (sorted longest-first, which is the classic FFD 11/9·OPT+1 bound),
  * bin ids are made globally unique with the partition id, and no
  * data ever crosses executors. Packing quality loses only the
  * cross-partition tail (each partition wastes at most its last
  * open bins), which vanishes as partitions hold thousands of docs.
  */
object Pack {

  /** Pack each partition's rows into bins of `binTokens` capacity.
    * Output: one row per input doc — (bin_id, idCol, tokensCol,
    * slot) where slot is the doc's index within its bin. Documents
    * larger than `binTokens` get a bin of their own (the caller
    * decides whether to chunk them first). `maxOpenBins` bounds the
    * packer's memory: when exceeded, the fullest open bin is sealed.
    * `widenInput` (default) spreads a narrow scan across the cluster
    * before packing; pass false when the input's partitioning is
    * itself meaningful (e.g. pre-grouped by domain).
    */
  def firstFit(docs: DataFrame, idCol: String, tokensCol: String,
               binTokens: Long, maxOpenBins: Int = 64,
               widenInput: Boolean = true): DataFrame = {
    require(binTokens > 0, "binTokens must be positive")
    require(maxOpenBins > 0, "maxOpenBins must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    (if (widenInput) graft.Par.widen(docs.select(col(idCol), col(tokensCol)), idCol)
     else docs)
      .select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .sortWithinPartitions(col(tokensCol).desc, col(idCol))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // open bins as (binSeq, remainingTokens, nextSlot)
        val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        var nextBin = 0L
        it.map { case (id, tokens) =>
          val need = math.min(math.max(tokens, 0L), binTokens)
          var idx = open.indexWhere(_._2 >= need)
          if (idx < 0) {
            if (open.size >= maxOpenBins)
              open.remove(open.zipWithIndex.minBy(_._1._2)._2) // seal fullest
            open += ((nextBin, binTokens, 0))
            nextBin += 1
            idx = open.size - 1
          }
          val (bin, rem, slot) = open(idx)
          open(idx) = (bin, rem - need, slot + 1)
          (pid << 32 | bin, id, tokens, slot)
        }
      }
      .toDF("bin_id", idCol, tokensCol, "slot")
  }

  /** Fixed-window document chunking with stride overlap — the step
    * between curation and packing: long documents become context-
    * window-sized pieces, consecutive chunks overlapping by
    * `window - stride` tokens so no boundary context is lost. Chunk
    * starts sit at multiples of `stride`; the final start is the
    * first whose window reaches the document end, so every token
    * lands in at least one chunk and every chunk holds at least
    * `window - stride + 1` tokens (never empty). Tokens are
    * whitespace runs (the `Text.tokenCountWs` unit).
    *
    * Pure per-row array expressions + one explode — codegen'd, zero
    * shuffle: chunking a 100 TB corpus runs at scan speed, and the
    * explode's fan-out is bounded by ~n/stride chunks per doc.
    *
    * Output: (idCol, chunk_id, chunk_text, n_tokens).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1 && stride <= window,
      "stride must be in [1, window] (stride > window would drop tokens)")
    val toks = split(trim(col(textCol)), "\\s+")
    // last chunk start index (in stride units): 0 when the doc fits
    // one window, else ceil((n-window)/stride) — ints are exact in
    // double well past any document length
    val lastStart = when(size(col("__ts")) <= window, lit(0))
      .otherwise(ceil((size(col("__ts")) - lit(window)).cast("double") / stride)
        .cast("int"))
    val start = col("chunk_id") * stride
    val chunkLen = least(lit(window), size(col("__ts")) - start)
    docs
      .select(col(idCol), toks.as("__ts"))
      .select(col(idCol), col("__ts"),
        explode(sequence(lit(0), lastStart)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__ts"), start + 1, chunkLen)).as("chunk_text"),
        chunkLen.as("n_tokens"))
  }
}
