package graft

import graft.sources.{Namespace, Versioned}
import Namespace.{Config, Dev, Prod, Test}

class NamespaceSpec extends SparkSuite {
  import spark.implicits._

  private def cfg(env: Namespace.Env,
                  vars: Map[String, String] = Map.empty) =
    Config(env, profileSchema = "analytics",
      prodDefault = "warehouse_analytics",
      testDefault = "warehouse_analytics_test",
      lookup = vars.get)

  test("prod/test routing: custom schemas prefix, defaults pin per env") {
    assert(Namespace.schemaName(cfg(Prod)) === "warehouse_analytics")
    assert(Namespace.schemaName(cfg(Test)) === "warehouse_analytics_test")
    assert(Namespace.schemaName(cfg(Prod), Some("staging")) === "analytics_staging")
    assert(Namespace.schemaName(cfg(Test), Some("mart")) === "analytics_mart")
    // prod/test never consult the dev var (lookup is empty here)
    assert(Namespace.schemaName(cfg(Prod), Some(" staging ")) === "analytics_staging")
  }

  test("dev routing: per-user namespace from the env var, lowercased") {
    val vars = Map("GRAFT_DEV_USER" -> "Ada")
    assert(Namespace.schemaName(cfg(Dev, vars)) === "ada")
    assert(Namespace.schemaName(cfg(Dev, vars), Some("staging"))
      === "analytics_ada_staging")
  }

  test("dev without the user var fails fast with the remedy in the message") {
    val e = intercept[IllegalStateException](Namespace.schemaName(cfg(Dev)))
    assert(e.getMessage.contains("GRAFT_DEV_USER is not set"))
    assert(e.getMessage.contains("export GRAFT_DEV_USER="))
    // blank counts as unset — a whitespace namespace must not resolve
    intercept[IllegalStateException](
      Namespace.schemaName(cfg(Dev, Map("GRAFT_DEV_USER" -> "  "))))
  }

  test("tablePath threads the resolved schema into sink paths end to end") {
    val root = tmpDir("ns")
    val path = Namespace.tablePath(cfg(Prod), root, "dim_customer", Some("mart"))
    assert(path.endsWith("/analytics_mart/dim_customer"))
    Namespace.createSchemaIfNotExists(spark, root, "analytics_mart")
    // any sink consumes the resolved path unchanged — Versioned here
    Versioned.commit((1L to 5L).toDF("id"), path, replace = true)
    assert(Versioned.read(spark, path).count() === 5)
  }

  test("cleanupTestSchemas drops exactly the MR run's layer schemas") {
    val root = tmpDir("nsclean")
    Seq("ci_mr_42_staging", "ci_mr_42_intermediate", "ci_mr_42_mart",
        "ci_mr_43_staging", "warehouse_analytics").foreach { s =>
      Namespace.createSchemaIfNotExists(spark, root, s)
    }
    val dropped = Namespace.cleanupTestSchemas(spark, root, "ci", "42")
    assert(dropped === Seq("ci_mr_42_staging", "ci_mr_42_intermediate",
      "ci_mr_42_mart"))
    val left = new java.io.File(root.stripPrefix("file:")).listFiles()
      .map(_.getName).toSet
    assert(left === Set("ci_mr_43_staging", "warehouse_analytics"))
    // idempotent: a second run has nothing to drop
    assert(Namespace.cleanupTestSchemas(spark, root, "ci", "42") === Nil)
  }
}
