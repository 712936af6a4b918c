package graft.ingest

import org.apache.spark.sql.SparkSession

/** DDL generation (SURVEY A21; reference:
  * app/service/log_importer.ts:101-133 builds CREATE TABLE text from
  * FieldMap). Here the schema object itself is the source of truth and
  * the DDL materializes a catalog table over the partitioned parquet
  * layout [[EventsWriter]] writes.
  */
object Ddl {

  /** CREATE TABLE text for the events table (external, partitioned by
    * month_key — the toYYYYMM analogue).
    */
  def createEventsTable(tableName: String, location: String): String = {
    val cols = EventsSchema.schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}")
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $tableName (
       |$cols,
       |  month_key INT
       |) USING parquet
       |PARTITIONED BY (month_key)
       |LOCATION '$location'""".stripMargin
  }

  /** Initialize (optionally force-dropping first, the reference's
    * forceInit flag) and register the table in the session catalog.
    */
  def init(spark: SparkSession, tableName: String, location: String,
      forceInit: Boolean = false): Unit = {
    if (forceInit) spark.sql(s"DROP TABLE IF EXISTS $tableName")
    spark.sql(createEventsTable(tableName, location))
    // pick up partitions already on disk
    spark.sql(s"MSCK REPAIR TABLE $tableName")
  }
}
