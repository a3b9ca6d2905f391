package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Multi-environment schema/namespace routing — the deploy seam the
  * reference implements as dbt macros (reference:
  * dbt_project/nomba_dbt/macros/generate_schema_name.sql:1-24 routes
  * prod/test to fixed analytics schemas and dev to a per-developer
  * namespace taken from an env var, FAILING FAST when unset;
  * macros/cleanup_test_schemas.sql drops a test run's
  * staging/intermediate/mart schemas; macros/create_schema.sql is
  * create-if-not-exists).
  *
  * Spark-first shape: a schema here is a DIRECTORY under a warehouse
  * root (the lake analog of a database/schema), so the same resolver
  * feeds every sink — [[Sink]] writers, [[Staging]] stage dirs,
  * [[Versioned]] tables all take paths, and [[tablePath]] is where
  * those paths come from. The resolved NAME is also usable verbatim
  * as a JDBC schema for the warehouse writers. Resolution is pure
  * (env lookup injected), so specs pin every branch.
  */
object Namespace {

  sealed trait Env { def name: String }
  case object Prod extends Env { val name = "prod" }
  case object Test extends Env { val name = "test" }
  case object Dev extends Env { val name = "dev" }

  /** Routing config. `profileSchema` plays target.schema's role (the
    * deploy profile's base schema); `prodDefault`/`testDefault` are
    * the fixed schemas models without a custom schema land in (the
    * reference pins its analytics schema per env the same way);
    * `devUserVar` names the env var carrying the developer namespace;
    * `lookup` is the env reader (injected for tests).
    */
  final case class Config(env: Env, profileSchema: String,
                          prodDefault: String, testDefault: String,
                          devUserVar: String = "GRAFT_DEV_USER",
                          lookup: String => Option[String] = sys.env.get)

  /** The generate_schema_name rule, branch for branch:
    *  - prod/test + custom schema → `<profileSchema>_<custom>`
    *  - prod/test + none         → the env's fixed default
    *  - dev: the dev user comes from `devUserVar` (lowercased),
    *    MISSING VAR IS AN ERROR with the remedy in the message —
    *    never silently write into a shared schema from a dev checkout;
    *    custom → `<profileSchema>_<user>_<custom>`, none → `<user>`
    */
  def schemaName(cfg: Config, customSchema: Option[String] = None): String = {
    customSchema.foreach(c => require(c.trim.nonEmpty, "custom schema is blank"))
    cfg.env match {
      case Prod | Test =>
        customSchema match {
          case Some(c) => s"${cfg.profileSchema}_${c.trim}"
          case None => if (cfg.env == Prod) cfg.prodDefault else cfg.testDefault
        }
      case Dev =>
        val user = cfg.lookup(cfg.devUserVar).map(_.trim).filter(_.nonEmpty)
          .getOrElse(throw new IllegalStateException(
            s"ERROR: ${cfg.devUserVar} is not set. " +
              s"Run: export ${cfg.devUserVar}=<your_name>"))
          .toLowerCase
        customSchema match {
          case Some(c) => s"${cfg.profileSchema}_${user}_${c.trim}"
          case None => user
        }
    }
  }

  /** Where a model's table lives: `<warehouseRoot>/<schema>/<table>`. */
  def tablePath(cfg: Config, warehouseRoot: String, table: String,
                customSchema: Option[String] = None): String =
    new Path(new Path(warehouseRoot, schemaName(cfg, customSchema)), table).toString

  /** create_schema_if_not_exists: idempotent mkdir of the schema dir. */
  def createSchemaIfNotExists(spark: SparkSession, warehouseRoot: String,
                              schema: String): String = {
    val p = new Path(warehouseRoot, schema)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    p.toString
  }

  /** cleanup_test_schemas: drop a CI/MR run's per-layer schemas —
    * `<prefix>_mr_<mrId>_<layer>` for each layer — and report what was
    * actually dropped. Missing schemas are skipped (DROP IF EXISTS).
    */
  def cleanupTestSchemas(spark: SparkSession, warehouseRoot: String,
                         schemaPrefix: String, mrId: String,
                         layers: Seq[String] =
                           Seq("staging", "intermediate", "mart")): Seq[String] = {
    val fs = new Path(warehouseRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    layers.flatMap { layer =>
      val schema = s"${schemaPrefix}_mr_${mrId}_$layer"
      val p = new Path(warehouseRoot, schema)
      if (fs.exists(p) && fs.delete(p, true)) Some(schema) else None
    }
  }
}
