package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Vault 2.0 raw-vault loaders (Linstedt & Olschimke '15) — the
  * warehouse-modeling pattern for auditable multi-source integration,
  * the third modeling surface next to the engine's star-schema marts
  * ([[Models]]) and SCD2 history ([[graft.operators.Scd2]]): HUBS
  * hold one row per business key, LINKS one row per relationship
  * instance, SATELLITES the attribute history hanging off a hub —
  * all keyed by deterministic hashes of the business keys so any
  * source system, any load order, any engine produces the SAME keys
  * (that hash-key determinism is what makes vault loads
  * embarrassingly parallel: no sequence generators, no lookups).
  *
  * Hash discipline: md5 over `concat_ws("||", cols cast string)` —
  * byte-identical in Spark and DuckDB (the engine's md5-portable
  * twin discipline). `concat_ws` SKIPS nulls in both engines, so a
  * null business key would collide with the absent-column form —
  * business keys and satellite attributes must be non-null or
  * pre-coalesced (the caller's contract, as in real vault loads
  * where the staging layer supplies zero-keys).
  *
  * Scale shape: every loader is one distinct/group-by on the
  * business key — map-side combinable, no windows, no sequence
  * bottleneck; the satellite delta is an anti-join on (hub_key,
  * hash_diff), batch-sized against a key-bucketed current satellite.
  */
object DataVault {

  private def hashOf(cols: Seq[String]): Column =
    md5(concat_ws("||", cols.map(c => col(c).cast("string")): _*))

  /** Hub load: one row per distinct business key with its
    * deterministic `hub_key`; `record_source` is the MINIMUM source
    * tag seen for the key (order-free, so multi-source unions load
    * in any order — the first-seen-by-name convention).
    */
  def hub(df: DataFrame, bkCols: Seq[String], sourceCol: Column,
          loadId: String): DataFrame = {
    require(bkCols.nonEmpty, "hub needs business-key columns")
    df.groupBy(bkCols.map(col): _*)
      .agg(min(sourceCol).as("record_source"))
      .select((hashOf(bkCols).as("hub_key") +: bkCols.map(col)) :+
        col("record_source") :+ lit(loadId).as("load_id"): _*)
  }

  /** Link load: one row per distinct relationship instance between
    * two hubs, keyed by the hash of ALL participating business keys,
    * carrying each side's hub key for exchange-free joins back.
    */
  def link(df: DataFrame, aBkCols: Seq[String], bBkCols: Seq[String],
           source: String, loadId: String): DataFrame = {
    require(aBkCols.nonEmpty && bBkCols.nonEmpty,
      "link needs business keys on both sides")
    val all = aBkCols ++ bBkCols
    df.select(all.map(col): _*).distinct()
      .select((hashOf(all).as("link_key") +:
        hashOf(aBkCols).as("hub_a_key") +:
        hashOf(bBkCols).as("hub_b_key") +: all.map(col)) :+
        lit(source).as("record_source") :+ lit(loadId).as("load_id"): _*)
  }

  /** Satellite load: the attribute payload per business key with its
    * `hash_diff` (md5 over the attributes — the change-detection
    * fingerprint the delta load compares on). One row per distinct
    * (key, attributes) state in the batch.
    */
  def satellite(df: DataFrame, bkCols: Seq[String], attrCols: Seq[String],
                source: String, loadId: String): DataFrame = {
    require(bkCols.nonEmpty && attrCols.nonEmpty,
      "satellite needs key and attribute columns")
    df.select((bkCols ++ attrCols).map(col): _*).distinct()
      .select((hashOf(bkCols).as("hub_key") +:
        hashOf(attrCols).as("hash_diff") +: attrCols.map(col)) :+
        lit(source).as("record_source") :+ lit(loadId).as("load_id"): _*)
  }

  /** Satellite DELTA: the new batch reduced to rows whose (hub_key,
    * hash_diff) is NOT already in the current satellite — new keys
    * and changed attribute states only, the rows an incremental
    * vault load appends. Anti-join on the two hashes: batch-sized
    * work against a hub_key-bucketed satellite at any history size.
    */
  def satelliteDelta(current: DataFrame, batch: DataFrame,
                     bkCols: Seq[String], attrCols: Seq[String],
                     source: String, loadId: String): DataFrame = {
    val staged = satellite(batch, bkCols, attrCols, source, loadId)
    staged.join(current.select(col("hub_key"), col("hash_diff")),
      Seq("hub_key", "hash_diff"), "left_anti")
  }
}
