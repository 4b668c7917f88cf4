package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** S5/S6 (SURVEY.md §2.1): the reference's DDL lifecycle —
  * `CREATE TABLE IF NOT EXISTS` for the staging/target pair
  * (rqtradein_etl.py:37-148) and the legacy-name rename migration
  * (`sp_rename 'api.RQTradeinReport_staging' → 'RQTradeinReportStaging'`,
  * rqtradein_etl.py:26-36) — on `spark.catalog`.
  *
  * All operations are idempotent: run-every-day semantics, exactly like
  * the reference's timer trigger. DDL is driver-side metadata only; no
  * data moves.
  */
object CatalogDdl {

  private def quote(name: String): String =
    name.split('.').map(p => s"`$p`").mkString(".")

  /** Idempotent CREATE TABLE (parquet-backed). With `location` the table
    * is external over an existing path; otherwise managed under the
    * warehouse dir. */
  def ensureTable(spark: SparkSession, name: String, schema: StructType,
      location: Option[String] = None): Unit =
    if (!spark.catalog.tableExists(name)) {
      val loc = location.map(p => s" LOCATION '$p'").getOrElse("")
      spark.sql(s"CREATE TABLE IF NOT EXISTS ${quote(name)} (${schema.toDDL}) USING parquet$loc")
    }

  /** S6: migrate a legacy table name — rename iff the old name exists and
    * the new one does not (exactly the reference's guarded sp_rename,
    * rqtradein_etl.py:28-35). Returns true when a rename happened. */
  def migrateRename(spark: SparkSession, oldName: String, newName: String): Boolean =
    if (spark.catalog.tableExists(oldName) && !spark.catalog.tableExists(newName)) {
      spark.sql(s"ALTER TABLE ${quote(oldName)} RENAME TO ${quote(newName)}")
      true
    } else false
}
