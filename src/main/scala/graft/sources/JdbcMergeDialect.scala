package graft.sources

/** How [[Sink.jdbcUpsert]]'s staged batch merges into its target —
  * the warehouse-dialect seam.
  *
  * The reference protocol (dagster_code/clickhouse_load_tool/
  * base_loader.py:419-556 `_perform_incremental_load_special`, and the
  * snapshot variant at base_loader.py:659) targets ClickHouse, which
  * supports NEITHER correlated subqueries in DELETE NOR transactions:
  * its delete is an asynchronous table MUTATION (`ALTER TABLE ...
  * DELETE WHERE key IN (...)`). A single hardcoded ANSI merge
  * therefore cannot be portable — the statement shape, the
  * key-matching form, and the atomicity story are all per-dialect:
  *
  *  - [[JdbcMergeDialect.Ansi]] — `DELETE FROM t WHERE key IN
  *    (SELECT key FROM tmp)` (tuple-IN for composite keys) + insert-
  *    select, inside one transaction. The portable default.
  *  - [[JdbcMergeDialect.Derby]] — Derby maps Spark StringType to
  *    CLOB, which is not comparable and not IN-able, and Derby has no
  *    row-value constructors; its merge is a correlated-EXISTS delete
  *    with string keys cast to `VARCHAR(32672)` (Derby's max — the
  *    cast exists ONLY here, it is not valid ANSI). String upsert
  *    keys longer than that would silently truncate-collide, so the
  *    caller path enforces a bounded key length.
  *  - [[JdbcMergeDialect.ClickHouse]] — mutation-style `ALTER TABLE
  *    ... DELETE` with `mutations_sync = 1` (the asynchronous default
  *    would race the following insert: freshly-inserted rows can be
  *    swept by a still-running mutation), then insert-select, NO
  *    transaction.
  *
  * '''Data-loss window on non-transactional engines''': with
  * `transactional = false` there is nothing to roll back — a failure
  * between the delete and the insert permanently loses the target
  * rows for every key in the batch. That is the reference protocol's
  * own exposure (ClickHouse has no transactions) and the reason its
  * loads are idempotent re-runs: the staging table still holds the
  * batch, so re-running the merge repairs the window. Engines that
  * cannot tolerate even that should use an insert-then-dedup pattern
  * (e.g. ReplacingMergeTree with a version column) instead of
  * delete-first — that trade-off belongs to the caller, not this
  * seam.
  */
sealed trait JdbcMergeDialect {

  /** Quote an identifier in this dialect. */
  def quote(ident: String): String

  /** Whether the merge statements should run inside a transaction
    * (attempted, not assumed — the connection may still refuse).
    */
  def transactional: Boolean

  /** The ordered merge statements: delete target rows whose key
    * appears in the staged table, then insert the staged rows.
    * `stringKeys` lists key columns of Spark StringType (dialects
    * that need comparability casts use it).
    */
  def mergeStatements(target: String, staging: String, key: Seq[String],
                      cols: Seq[String],
                      stringKeys: Set[String]): Seq[String]

  /** DDL run against the freshly-staged table BEFORE the merge: an
    * index on the key columns. Without it the delete's key match
    * degenerates on nested-loop engines — Derby plans the
    * correlated-EXISTS delete as scan-target × scan-staging,
    * O(target·delta) row comparisons (measured: a 150k-row merge ran
    * 15+ minutes of pure lock-and-scan CPU; with the index it is
    * O(target) probes). Engines whose delete is already a keyed scan
    * (ClickHouse mutations) return no statements.
    */
  def stagingPrepStatements(staging: String, key: Seq[String],
                            stringKeys: Set[String]): Seq[String] = {
    val idxCols = indexableKeys(key, stringKeys)
    if (idxCols.isEmpty) Nil
    else Seq(s"CREATE INDEX ${staging}_kix ON $staging " +
      s"(${idxCols.map(quote).mkString(", ")})")
  }

  /** Which key columns the staging index may cover (dialects with
    * non-indexable string mappings restrict this).
    */
  protected def indexableKeys(key: Seq[String],
                              stringKeys: Set[String]): Seq[String] = key

  protected def insertSelect(target: String, staging: String,
                             cols: Seq[String]): String = {
    val colList = cols.map(quote).mkString(", ")
    s"INSERT INTO $target ($colList) SELECT $colList FROM $staging"
  }

  /** `key` or `(k1, k2, ...)` — the IN-subquery left-hand side. */
  protected def keyTuple(key: Seq[String]): String =
    if (key.sizeIs == 1) quote(key.head)
    else key.map(quote).mkString("(", ", ", ")")
}

object JdbcMergeDialect {

  /** Portable ANSI merge: keyed IN-subquery delete + insert-select,
    * transactional. (The reference's own dialect-portable form —
    * base_loader.py builds exactly this key-IN delete.)
    */
  case object Ansi extends JdbcMergeDialect {
    def quote(ident: String): String = "\"" + ident + "\""
    val transactional = true
    def mergeStatements(target: String, staging: String, key: Seq[String],
                        cols: Seq[String], stringKeys: Set[String]): Seq[String] =
      Seq(
        s"DELETE FROM $target WHERE ${keyTuple(key)} IN " +
          s"(SELECT ${key.map(quote).mkString(", ")} FROM $staging)",
        insertSelect(target, staging, cols))
  }

  /** Derby: correlated-EXISTS delete; string keys cast to
    * VARCHAR(32672) for CLOB comparability (Derby-only syntax).
    */
  case object Derby extends JdbcMergeDialect {
    def quote(ident: String): String = "\"" + ident + "\""
    val transactional = true
    /** Derby silently truncates longer strings in the cast — two long
      * keys sharing a 32672-char prefix would collide in the match,
      * so the caller rejects keys that can exceed it.
      */
    val maxStringKeyLength = 32672
    /** Spark's JDBC writer maps StringType to Derby CLOB, which is not
      * indexable — the staging index covers the non-string keys only
      * (string-only-key merges stay correct but fall back to the
      * scan probe; bound the delta size there).
      */
    override protected def indexableKeys(key: Seq[String],
                                         stringKeys: Set[String]): Seq[String] =
      key.filterNot(stringKeys)
    def mergeStatements(target: String, staging: String, key: Seq[String],
                        cols: Seq[String], stringKeys: Set[String]): Seq[String] = {
      def ref(t: String, k: String) =
        if (stringKeys(k)) s"CAST($t.${quote(k)} AS VARCHAR($maxStringKeyLength))"
        else s"$t.${quote(k)}"
      val keyMatch = key
        .map(k => s"${ref(staging, k)} = ${ref(target, k)}").mkString(" AND ")
      Seq(
        s"DELETE FROM $target WHERE EXISTS " +
          s"(SELECT 1 FROM $staging WHERE $keyMatch)",
        insertSelect(target, staging, cols))
    }
  }

  /** ClickHouse: synchronous mutation delete + insert, no transaction
    * (mirrors base_loader.py:419-556; see the trait scaladoc for the
    * data-loss window).
    */
  case object ClickHouse extends JdbcMergeDialect {
    def quote(ident: String): String = "`" + ident + "`"
    val transactional = false
    /** ClickHouse has no CREATE INDEX; the mutation delete hashes the
      * IN-subquery against its own sparse primary index — no staging
      * prep needed or possible.
      */
    override def stagingPrepStatements(staging: String, key: Seq[String],
                                       stringKeys: Set[String]): Seq[String] = Nil
    def mergeStatements(target: String, staging: String, key: Seq[String],
                        cols: Seq[String], stringKeys: Set[String]): Seq[String] =
      Seq(
        s"ALTER TABLE $target DELETE WHERE ${keyTuple(key)} IN " +
          s"(SELECT ${key.map(quote).mkString(", ")} FROM $staging) " +
          "SETTINGS mutations_sync = 1",
        insertSelect(target, staging, cols))
  }

  /** Infer the dialect from the JDBC URL; unknown engines get the
    * portable ANSI form.
    */
  def forUrl(url: String): JdbcMergeDialect = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    if (u.startsWith("jdbc:derby:")) Derby
    else if (u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")) ClickHouse
    else Ansi
  }
}
