package graft

import graft.pipeline.DataVault
import org.apache.spark.sql.functions._

class DataVaultSpec extends SparkSuite {
  import spark.implicits._

  test("hub: one row per key, min-source attribution, deterministic hash keys") {
    val u = Seq((1L, "crm"), (2L, "crm"), (2L, "orders"), (3L, "orders"))
      .toDF("custkey", "src")
    val out = DataVault.hub(u, Seq("custkey"), col("src"), "L1")
      .collect().map(r => r.getLong(1) ->
        ((r.getString(0), r.getString(2), r.getString(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(2L)._2 === "crm")    // seen by both → min source tag
    assert(out(3L)._2 === "orders") // orders-only key still lands
    assert(out.values.forall(_._3 == "L1"))
    // hash key is a pure function of the business key: re-load agrees
    val again = DataVault.hub(u, Seq("custkey"), col("src"), "L2")
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(out.forall { case (k, (h, _, _)) => again(k) == h })
  }

  test("link: distinct relationship instances, both hub keys ride along") {
    val o = Seq((10L, 1L), (10L, 1L), (11L, 2L)).toDF("ok", "ck")
    val out = DataVault.link(o, Seq("ok"), Seq("ck"), "orders", "L1")
    assert(out.count() === 2L)
    val hub = DataVault.hub(o.select(col("ck"), lit("x").as("s")),
      Seq("ck"), col("s"), "L1")
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    val got = out.collect().map(r =>
      r.getAs[Long]("ok") -> r.getAs[String]("hub_b_key")).toMap
    assert(got(10L) === hub(1L)) // link's side key ≡ the hub's own key
    assert(got(11L) === hub(2L))
  }

  test("satellite + delta: hash_diff changes land, unchanged states anti-join away") {
    val b1 = Seq((1L, "AUTO", 7), (2L, "BIKE", 8)).toDF("ck", "seg", "nat")
    val cur = DataVault.satellite(b1, Seq("ck"), Seq("seg", "nat"),
      "crm", "L1")
    assert(cur.count() === 2L)
    // batch 2: key 1 changes seg, key 2 unchanged, key 3 is new
    val b2 = Seq((1L, "ROAD", 7), (2L, "BIKE", 8), (3L, "SHIP", 9))
      .toDF("ck", "seg", "nat")
    val delta = DataVault.satelliteDelta(cur, b2, Seq("ck"),
      Seq("seg", "nat"), "crm", "L2")
      .collect().map(r => r.getAs[String]("seg")).toSet
    assert(delta === Set("ROAD", "SHIP"))
    // replay of an identical batch is a no-op delta
    val replay = DataVault.satelliteDelta(cur, b1, Seq("ck"),
      Seq("seg", "nat"), "crm", "L3")
    assert(replay.count() === 0L)
  }
}
