package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog-table write hygiene shared by the bucketed-table writers
  * ([[GraphIO.writeBucketed]], [[graft.dedup.DedupIndex.writeBucketed]]).
  *
  * With the default in-memory catalog, table METADATA dies with the
  * session but the warehouse DIRECTORY does not — a fresh session that
  * `saveAsTable`s the same name then fails with LOCATION_ALREADY_EXISTS
  * because `mode("overwrite")` sees no table to drop while the old
  * session's files still occupy the location. An orphaned location
  * under the warehouse is garbage by definition (nothing in the current
  * catalog points at it), so writers drop both the table (if any) and
  * the stale directory before writing.
  */
object CatalogTables {

  /** Make `table` writable: drop a registered table of that name and
    * delete its (possibly orphaned) default warehouse location. */
  def prepareOverwrite(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
