package graft

import graft.sources.{Sink, Sources}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("v", DoubleType)))

  test("orc/csv/jsonl roundtrips are lossless: microsecond timestamps, float text, quoted strings") {
    val dir = tmpDir("rt")
    val tsSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("x", DoubleType), StructField("s", StringType)))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456"),
        1.25e-3, "a,b \"quoted\""),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 00:00:00"),
        1.0e7, "plain")).toDF("id", "ts", "x", "s")
    val want = df.orderBy("id").collect().toSeq
    val tf = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    df.write.orc(s"$dir/o")
    assert(Sources.orc(spark, s"$dir/o", tsSchema)
      .orderBy("id").collect().toSeq === want)
    df.write.option("header", "true").option("timestampFormat", tf)
      .csv(s"$dir/c")
    assert(Sources.csv(spark, s"$dir/c", tsSchema,
        options = Map("timestampFormat" -> tf))
      .orderBy("id").collect().toSeq === want)
    df.write.option("timestampFormat", tf).json(s"$dir/j")
    assert(Sources.jsonl(spark, s"$dir/j", tsSchema,
        options = Map("timestampFormat" -> tf))
      .orderBy("id").collect().toSeq === want)
  }

  test("csv and jsonl readers enforce the declared schema") {
    val dir = tmpDir("src")
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
      .write.option("header", "true").csv(s"$dir/c")
    val c = Sources.csv(spark, s"$dir/c", schema)
    assert(c.schema === schema)
    assert(c.count() === 2)

    Seq((3L, "c", 3.5)).toDF("id", "name", "v").write.json(s"$dir/j")
    val j = Sources.jsonl(spark, s"$dir/j", schema)
    assert(j.schema === schema)
    assert(j.collect()(0).getLong(0) === 3L)

    Seq((4L, "d", 4.5)).toDF("id", "name", "v").write.orc(s"$dir/o")
    val o = Sources.orc(spark, s"$dir/o", schema)
    assert(o.schema === schema)
    assert(o.collect()(0).getLong(0) === 4L)
  }

  test("overwritePartitions replaces only the batch's partitions") {
    val dir = tmpDir("sink") + "/t"
    Sink.partitioned(
      Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "dt"),
      dir, Seq("dt"))
    // re-load day 2 with different content; day 1 must survive
    Sink.overwritePartitions(
      Seq((20L, "2024-01-02")).toDF("id", "dt"), dir, Seq("dt"))
    // partition dirs type-infer back as Date → compare via toString
    val out = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.get(1).toString))
    assert(out.toSeq === Seq((1L, "2024-01-01"), (20L, "2024-01-02")))
  }

  test("Sink.upsert merges latest-per-key into the parquet target") {
    val dir = tmpDir("ups") + "/t"
    Seq((1L, 1L, "old"), (2L, 1L, "keep")).toDF("k", "ver", "v")
      .write.parquet(dir)
    Sink.upsert(spark,
      dir, Seq((1L, 2L, "new"), (3L, 1L, "ins")).toDF("k", "ver", "v"),
      Seq("k"), "ver")
    val out = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("partitioned reads prune to the filtered partition directories") {
    val dir = tmpDir("prune") + "/t"
    Sink.partitioned(
      Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
        .toDF("id", "dt"), dir, Seq("dt"))
    val pruned = spark.read.parquet(dir).filter(col("dt") === "2024-01-02")
    assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(2L))
    // the dt predicate must be a PARTITION filter (directory pruning),
    // and the executed scan must have read exactly one file — the
    // mechanism that turns a daily delta on a 100 TB table into a
    // single-directory read. (inputFiles reports the pre-pruning
    // relation, so check the scan node itself.)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("2024-01-02")),
      scan.partitionFilters.mkString(", "))
    assert(scan.metrics("numFiles").value === 1L)
  }

  test("compact rewrites a many-small-file table to the target count, same data") {
    val dir = tmpDir("cmp") + "/t"
    val df = (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "v")
    df.repartition(20).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files() === 20)
    // huge target size → everything fits one file
    val n = Sink.compact(spark, dir, targetBytes = 1L << 30)
    assert(n === 1 && files() === 1)
    val out = spark.read.parquet(dir)
    assert(out.count() === 1000 && out.agg(sum("id")).head.getLong(0) === 500500L)
    // already compact → no-op
    assert(Sink.compact(spark, dir, targetBytes = 1L << 30) === 1)
  }

  test("clusteredWrite: disjoint per-file key ranges, sorted rows, same data") {
    val dir = tmpDir("clw") + "/t"
    // write shuffled keys so clustering has real work to do
    val df = scala.util.Random.shuffle((1L to 5000L).toList)
      .map(i => (i, s"v$i")).toDF("k", "v")
    val n = Sink.clusteredWrite(df, dir, Seq("k"), numFiles = 8)
    assert(n === 8)
    val back = spark.read.parquet(dir)
    assert(back.count() === 5000 && back.agg(sum("k")).head.getLong(0) === 12502500L)
    // every data file owns a disjoint key range (the property parquet
    // footer/row-group pruning needs): sorted by min, no interleaving
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length === 8)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(lo2 > hi1, s"file ranges interleave: hi=$hi1 lo=$lo2")
    }
    // rows inside each file are sorted (tight row-group stats)
    val unsorted = back
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy(monotonically_increasing_id())))
    // read order within a parquet file is write order
    assert(unsorted.filter(col("prev") > col("k")).isEmpty)
  }

  test("writeFileStats + prunedRead: driver-side file skipping, plain-read equivalence") {
    val dir = tmpDir("prune") + "/t"
    val df = scala.util.Random.shuffle((1L to 5000L).toList)
      .map(i => (i, i % 97, s"v$i")).toDF("k", "grp", "v")
    assert(Sink.clusteredWrite(df, dir, Seq("k"), numFiles = 8) === 8)
    assert(Sink.writeFileStats(spark, dir, Seq("k")) === 8)
    // one file's own [lo, hi] (from the manifest) hits exactly that
    // file — ranges are disjoint, so no other file can overlap
    val st = spark.read.parquet(s"$dir/_graft_stats")
      .select("min_k", "max_k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (flo, fhi) = st(3)
    val pruned = Sink.prunedRead(spark, dir, "k", flo, fhi)
    assert(pruned.inputFiles.length === 1,
      s"expected 1 file scanned, got ${pruned.inputFiles.length}")
    val full = spark.read.parquet(dir).filter(col("k").between(flo, fhi))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ===
      full.collect().map(_.getLong(0)).sorted.toSeq)
    // a range straddling a file boundary keeps exactly both sides
    val straddle = Sink.prunedRead(spark, dir, "k", st(3)._2, st(4)._1)
    assert(straddle.inputFiles.length === 2 && straddle.count() === 2L)
    // a range beyond all stats prunes everything but stays queryable
    val none = Sink.prunedRead(spark, dir, "k", 99999L, 100000L)
    assert(none.count() === 0L)
    // unclustered layout: pruning degrades to the plain read, results equal
    val dir2 = tmpDir("prune2") + "/t"
    df.repartition(6).write.parquet(dir2)
    Sink.writeFileStats(spark, dir2, Seq("k"))
    val p2 = Sink.prunedRead(spark, dir2, "k", 1200L, 1300L)
    assert(p2.count() === 101L)
    // null stats keep the file; residual filter still drops null rows
    val dir3 = tmpDir("prune3") + "/t"
    Seq[(java.lang.Long, String)]((null, "a"), (null, "b"))
      .toDF("k", "v").write.parquet(dir3)
    Sink.writeFileStats(spark, dir3, Seq("k"))
    assert(Sink.prunedRead(spark, dir3, "k", 0L, 10L).count() === 0L)
  }

  test("writeShards: one file per shard, hash membership, intra-file order, manifest") {
    val dir = tmpDir("shards") + "/t"
    val df = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val manifest = Sink.writeShards(df, "id", nShards = 8, path = dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    // exactly one data file per shard directory
    val shardFiles = (0 until 8).map { k =>
      val fs = new java.io.File(s"$dir/shard=$k").listFiles
        .filter(f => f.getName.endsWith(".parquet"))
      assert(fs.length === 1, s"shard $k has ${fs.length} data files")
      k -> fs.head
    }.toMap
    // read-back: membership = pmod(xxhash64(id, 42), 8), nothing lost
    val back = spark.read.parquet(dir)
    assert(back.count() === 500)
    assert(back.filter(
      pmod(xxhash64(col("id"), lit(42L)), lit(8L)).cast("int") =!= col("shard"))
      .isEmpty, "a row landed in the wrong shard")
    // the _manifest dir is invisible to the plain parquet read
    assert(back.columns.sorted.toSeq === Seq("id", "payload", "shard"))
    // manifest counts match the files
    val actual = back.groupBy("shard").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(manifest === actual)
    // intra-file order is (xxhash64(id, seed), id) — the deterministic
    // shuffle a trainer streams; file read order is write order
    val fileIds = spark.read.parquet(shardFiles(3).getPath)
      .select("id").as[Long].collect()
    val expected = back.filter(col("shard") === 3)
      .select(col("id"), xxhash64(col("id"), lit(42L)).as("h"))
      .orderBy(col("h"), col("id")).select("id").as[Long].collect()
    assert(fileIds.toSeq === expected.toSeq)
    // rerun into a second dir: byte-stable membership (deterministic)
    val dir2 = tmpDir("shards2") + "/t"
    Sink.writeShards(df.repartition(7), "id", nShards = 8, path = dir2)
    val back2 = spark.read.parquet(dir2).select("id", "shard")
    assert(back2.except(back.select("id", "shard")).isEmpty)
  }

  test("compact preserves a partitioned layout (per-leaf compaction)") {
    val dir = tmpDir("cmpp") + "/t"
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
      .toDF("id", "dt").repartition(10)
    df.write.partitionBy("dt").parquet(dir)
    val n = Sink.compact(spark, dir, targetBytes = 1L << 30)
    assert(n === 2) // one file per partition leaf
    // layout survives: pruning still hits a single directory
    val pruned = spark.read.parquet(dir).filter(col("dt") === "2024-01-01")
    assert(pruned.collect().length === 100)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value === 1L)
  }

  test("jdbc partitioned read stripes the table; incremental predicate pushes down") {
    // embedded Derby (ships with Spark) stands in for the reference's
    // Postgres source; in-memory db is shared across connections in
    // this JVM, so the 4 stripe readers all see it
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE tx (id BIGINT, tracking BIGINT, v VARCHAR(20))")
      val ins = conn.prepareStatement("INSERT INTO tx VALUES (?, ?, ?)")
      (1L to 100L).foreach { i =>
        ins.setLong(1, i); ins.setLong(2, i); ins.setString(3, s"row$i")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    // full read: numPartitions CONCURRENT stripes over [lower, upper)
    val full = Sources.jdbc(spark, url, "tx", "tracking", 1L, 101L, 4, props)
    assert(full.count() === 100)
    assert(full.rdd.getNumPartitions === 4)
    // bounds split stripes but never filter: rows outside land in the
    // edge stripes
    val narrow = Sources.jdbc(spark, url, "tx", "tracking", 40L, 60L, 4, props)
    assert(narrow.count() === 100)

    // incremental extract: only post-watermark rows, predicate pushed
    // into the remote query (the reference's WHERE tracking > last)
    val inc = Sources.jdbcIncremental(spark, url, "tx", "tracking", lit(60L),
      "tracking", 60L, 101L, 4, props)
    assert(inc.count() === 40)
    assert(inc.agg(min(col("tracking"))).head.getLong(0) === 61L)
    val planStr = inc.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("pushedfilters")
      && planStr.toLowerCase.contains("tracking"),
      s"watermark predicate not pushed to the JDBC scan:\n$planStr")
  }

  test("bucketed tables join with NO shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse dirs survive → clear them or CTAS refuses the location
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("fact_b", "dim_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Sink.bucketedTable((1L to 1000L).map(i => (i, i % 100)).toDF("id", "key"),
      "fact_b", "key", 8, sortCol = Some("key"))
    Sink.bucketedTable((0L until 100L).map(i => (i, s"d$i")).toDF("key", "attr"),
      "dim_b", "key", 8, sortCol = Some("key"))
    val joined = spark.table("fact_b").join(spark.table("dim_b"), "key")
    assert(joined.count() === 1000)
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeLike => s
    }
    assert(shuffles.isEmpty, s"expected exchange-free bucketed join, got ${shuffles.size} shuffles")
  }

  test("jdbcUpsert: staged temp-table delete+insert equals Cdc.upsert, idempotent") {
    val url = s"jdbc:derby:memory:graftup${System.nanoTime()};create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val jprops = { val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }; p }
    def readT() = spark.read.jdbc(url, "wh_orders", jprops)

    val target = Seq((1L, 1L, "old"), (2L, 1L, "keep")).toDF("k", "ver", "v")
    // first call creates the table from the batch (fresh load)
    assert(Sink.jdbcUpsert(target, url, "wh_orders", Seq("k"), "ver",
      connProps = props) === 2L)
    assert(readT().count() === 2)

    // batch with an intra-batch duplicate: latest-per-key must win
    // BEFORE the warehouse sees anything
    val updates = Seq((1L, 2L, "new"), (1L, 3L, "newest"), (3L, 1L, "ins"))
      .toDF("k", "ver", "v")
    val n = Sink.jdbcUpsert(updates, url, "wh_orders", Seq("k"), "ver",
      connProps = props)
    assert(n === 2L) // k=1 deduped to ver=3, plus k=3

    def rows() = readT().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = graft.operators.Cdc
      .upsert(target, updates, Seq("k"), "ver")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows() === expected)
    assert(rows() === Seq((1L, 3L, "newest"), (2L, 1L, "keep"), (3L, 1L, "ins")))

    // idempotency: replaying the same batch changes nothing
    assert(Sink.jdbcUpsert(updates, url, "wh_orders", Seq("k"), "ver",
      connProps = props) === 2L)
    assert(rows() === expected)

    // the staging table is dropped even on the happy path
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toList
      assert(!names.exists(_.toUpperCase.contains("_STG_")),
        s"staging table leaked: $names")
    } finally conn.close()
  }

  test("jdbcUpsert: composite key and empty batch") {
    val url = s"jdbc:derby:memory:graftup2${System.nanoTime()};create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val jprops = { val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }; p }
    val target = Seq((1L, "a", 1L, 10.0), (1L, "b", 1L, 20.0), (2L, "a", 1L, 30.0))
      .toDF("k1", "k2", "ver", "amt")
    Sink.jdbcUpsert(target, url, "wh_comp", Seq("k1", "k2"), "ver",
      connProps = props)
    val updates = Seq((1L, "b", 2L, 25.0), (2L, "b", 1L, 40.0))
      .toDF("k1", "k2", "ver", "amt")
    assert(Sink.jdbcUpsert(updates, url, "wh_comp", Seq("k1", "k2"), "ver",
      connProps = props) === 2L)
    val out = spark.read.jdbc(url, "wh_comp", jprops)
      .orderBy("k1", "k2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3))).toSeq
    assert(out === Seq((1L, "a", 10.0), (1L, "b", 25.0), (2L, "a", 30.0), (2L, "b", 40.0)))

    // empty delta is a no-op that still cleans up its staging table
    val empty = updates.filter(col("ver") < 0)
    assert(Sink.jdbcUpsert(empty, url, "wh_comp", Seq("k1", "k2"), "ver",
      connProps = props) === 0L)
    assert(spark.read.jdbc(url, "wh_comp", jprops).count() === 4)
  }

  test("jdbcUpsert: failed merge rolls back and drops the staging table") {
    val url = s"jdbc:derby:memory:graftup3${System.nanoTime()};create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val jprops = { val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }; p }
    val target = Seq((1L, 1L, "a")).toDF("k", "ver", "v")
    Sink.jdbcUpsert(target, url, "wh_fail", Seq("k"), "ver", connProps = props)
    // a batch with an EXTRA column stages fine (its own table) but the
    // insert-select into the narrower target must fail mid-merge
    val bad = Seq((1L, 2L, "b", "boom")).toDF("k", "ver", "v", "extra")
    intercept[java.sql.SQLException] {
      Sink.jdbcUpsert(bad, url, "wh_fail", Seq("k"), "ver", connProps = props)
    }
    // target unchanged (transaction rolled back — the delete must not
    // have stuck without its insert)
    val rows = spark.read.jdbc(url, "wh_fail", jprops).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows === Seq((1L, 1L, "a")))
    // staging table dropped despite the failure
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toList
      assert(!names.exists(_.toUpperCase.contains("_STG_")),
        s"staging table leaked: $names")
    } finally conn.close()
  }

  test("JdbcMergeDialect: URL inference and per-dialect merge SQL") {
    import graft.sources.JdbcMergeDialect
    import graft.sources.JdbcMergeDialect.{Ansi, ClickHouse, Derby}
    assert(JdbcMergeDialect.forUrl("jdbc:derby:memory:x;create=true") === Derby)
    assert(JdbcMergeDialect.forUrl("jdbc:clickhouse://wh:8123/raw") === ClickHouse)
    assert(JdbcMergeDialect.forUrl("jdbc:ch://wh:8123/raw") === ClickHouse)
    assert(JdbcMergeDialect.forUrl("jdbc:postgresql://db/x") === Ansi)

    // ANSI: keyed IN-subquery delete (tuple-IN for composite keys),
    // transactional
    assert(Ansi.transactional)
    assert(Ansi.mergeStatements("t", "t_stg", Seq("k"), Seq("k", "v"), Set.empty) === Seq(
      """DELETE FROM t WHERE "k" IN (SELECT "k" FROM t_stg)""",
      """INSERT INTO t ("k", "v") SELECT "k", "v" FROM t_stg"""))
    assert(Ansi.mergeStatements("t", "t_stg", Seq("k1", "k2"), Seq("k1", "k2", "v"),
      Set.empty).head ===
      """DELETE FROM t WHERE ("k1", "k2") IN (SELECT "k1", "k2" FROM t_stg)""")

    // ClickHouse: the reference's mutation protocol (base_loader.py:419)
    // — ALTER TABLE DELETE, synchronous so the following insert can't
    // race the mutation, backtick identifiers, NO transaction
    assert(!ClickHouse.transactional)
    assert(ClickHouse.mergeStatements("raw.orders", "raw.orders_stg", Seq("order_id"),
      Seq("order_id", "amount"), Set.empty) === Seq(
      "ALTER TABLE raw.orders DELETE WHERE `order_id` IN " +
        "(SELECT `order_id` FROM raw.orders_stg) SETTINGS mutations_sync = 1",
      "INSERT INTO raw.orders (`order_id`, `amount`) " +
        "SELECT `order_id`, `amount` FROM raw.orders_stg"))
    assert(ClickHouse.mergeStatements("t", "t_stg", Seq("a", "b"),
      Seq("a", "b"), Set.empty).head ===
      "ALTER TABLE t DELETE WHERE (`a`, `b`) IN " +
        "(SELECT `a`, `b` FROM t_stg) SETTINGS mutations_sync = 1")

    // Derby: correlated EXISTS + the CLOB-comparability cast on STRING
    // keys only (Derby-specific syntax lives only in this dialect)
    assert(Derby.transactional)
    val derbySql = Derby.mergeStatements("t", "t_stg", Seq("k", "name"),
      Seq("k", "name", "v"), stringKeys = Set("name"))
    assert(derbySql.head ===
      """DELETE FROM t WHERE EXISTS (SELECT 1 FROM t_stg WHERE """ +
        """t_stg."k" = t."k" AND CAST(t_stg."name" AS VARCHAR(32672)) = """ +
        """CAST(t."name" AS VARCHAR(32672)))""")

    // staging prep: key index before the merge (the nested-loop
    // killer); Derby skips CLOB (string) keys, ClickHouse has no
    // index DDL at all
    assert(Ansi.stagingPrepStatements("t_stg", Seq("k1", "k2"), Set.empty) ===
      Seq("""CREATE INDEX t_stg_kix ON t_stg ("k1", "k2")"""))
    assert(Derby.stagingPrepStatements("t_stg", Seq("k", "name"), Set("name")) ===
      Seq("""CREATE INDEX t_stg_kix ON t_stg ("k")"""))
    assert(Derby.stagingPrepStatements("t_stg", Seq("name"), Set("name")) === Nil)
    assert(ClickHouse.stagingPrepStatements("t_stg", Seq("k"), Set.empty) === Nil)
  }

  test("jdbcUpsert: explicit ANSI dialect runs the IN-subquery merge on a live engine") {
    // Derby happens to also accept the single-key ANSI form (numeric
    // keys), so the pluggable seam is exercised end-to-end: same
    // upsert semantics through a DIFFERENT generated merge
    val url = s"jdbc:derby:memory:graftup4${System.nanoTime()};create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val jprops = { val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }; p }
    val target = Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "ver", "amt")
    Sink.jdbcUpsert(target, url, "wh_ansi", Seq("k"), "ver", connProps = props,
      dialect = Some(graft.sources.JdbcMergeDialect.Ansi))
    val updates = Seq((2L, 2L, 25.0), (3L, 1L, 30.0)).toDF("k", "ver", "amt")
    assert(Sink.jdbcUpsert(updates, url, "wh_ansi", Seq("k"), "ver",
      connProps = props,
      dialect = Some(graft.sources.JdbcMergeDialect.Ansi)) === 2L)
    val rows = spark.read.jdbc(url, "wh_ansi", jprops).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, 1L, 10.0), (2L, 2L, 25.0), (3L, 1L, 30.0)))
  }

  test("readQuarantined splits schema-true rows from raw-preserved failures (json + csv)") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val jdir = tmpDir("quar-json")
    java.nio.file.Files.write(java.nio.file.Paths.get(jdir, "b.jsonl"),
      Seq("""{"id": 1, "name": "a"}""", "broken", """{"id": "no", "name": "b"}""")
        .mkString("\n").getBytes("UTF-8"))
    val (jGood, jBad) = Sources.readQuarantined(spark, jdir, schema, "json")
    assert(jGood.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a")))
    assert(jBad.collect().map(_.getString(0)).toSet
      === Set("broken", """{"id": "no", "name": "b"}"""))
    val cdir = tmpDir("quar-csv")
    java.nio.file.Files.write(java.nio.file.Paths.get(cdir, "b.csv"),
      Seq("id,name", "1,a", "oops,b", "2,c").mkString("\n").getBytes("UTF-8"))
    val (cGood, cBad) = Sources.readQuarantined(spark, cdir, schema, "csv")
    assert(cGood.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "c")))
    assert(cBad.collect().map(_.getString(0)).toSet === Set("oops,b"))
    Par.release()
  }
}
