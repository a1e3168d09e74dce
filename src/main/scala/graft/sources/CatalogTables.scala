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
    * delete its data directory.
    *
    * When the table EXISTS, its actual location is resolved from the
    * catalog (DESCRIBE EXTENDED) before anything is deleted — a table
    * registered with a custom LOCATION or under a non-default database
    * must not have an unrelated `warehouse/<name>` directory removed in
    * its stead. The default warehouse path is deleted only when NO table
    * of that name is registered (the genuinely-orphaned-directory case
    * this helper exists for); if the name resolves to something without a
    * location (a view), nothing is deleted.
    */
  def prepareOverwrite(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions.col
    val location: Option[String] =
      if (spark.catalog.tableExists(table))
        spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
          .filter(col("col_name") === "Location")
          .collect().headOption.map(_.getString(1)) // bounded: <= 1 row
      else
        Some(new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase).toString)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    location.foreach { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
