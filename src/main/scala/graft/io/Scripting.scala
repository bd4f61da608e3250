package graft.io

import org.apache.spark.sql.types.StructType

/** DDL / MERGE statement generation from an output schema — test-scenario
  * scaffolding matching the reference's `scriptTable` / `scriptMerge`
  * (dbldatagen/data_generator.py:1780-1955). Pure string building; nothing
  * here executes SQL.
  */
object Scripting {

  /** `CREATE TABLE name (cols...) USING format [LOCATION '...']`. */
  def scriptTable(schema: StructType, tableName: String = "test_data",
      location: Option[String] = None, tableFormat: String = "parquet"): String = {
    val cols = schema.fields.map(f => s"    ${f.name} ${f.dataType.sql}").mkString(",\n")
    val loc = location.map(l => s"\nLOCATION '$l'").getOrElse("")
    s"CREATE TABLE $tableName (\n$cols\n)\nUSING $tableFormat$loc"
  }

  /** Delta-style `MERGE INTO` with configurable clauses (CDC scenarios).
    *
    * @param updateExpr      when-matched SET assignments; defaults to all
    *                        non-key columns from the source
    * @param delExpr         optional WHEN MATCHED AND cond THEN DELETE
    * @param insertExpr      when-not-matched column values; defaults to all
    *                        source columns
    * @param srcAlias        alias for the source relation
    * @param timeExpr        optional time-travel clause appended to the
    *                        source (e.g. "TIMESTAMP AS OF '2020-01-01'")
    */
  def scriptMerge(schema: StructType, tgtName: String = "test_data", srcName: String = "source_data",
      joinExpr: String, updateExpr: Option[Seq[String]] = None, delExpr: Option[String] = None,
      insertExpr: Option[Seq[String]] = None, updateColumns: Option[Seq[String]] = None,
      srcAlias: String = "src", tgtAlias: String = "tgt", timeExpr: Option[String] = None): String = {
    val colNames = schema.fields.map(_.name).toSeq
    val updCols = updateColumns.getOrElse(colNames)
    val updates = updateExpr.getOrElse(updCols.map(c => s"$srcAlias.$c"))
    require(updates.length == updCols.length,
      s"updateExpr has ${updates.length} entries for ${updCols.length} update columns")
    val inserts = insertExpr.getOrElse(colNames.map(c => s"$srcAlias.$c"))
    require(inserts.length == colNames.length,
      s"insertExpr has ${inserts.length} entries for ${colNames.length} columns")

    val setClause = updCols.zip(updates).map { case (c, e) => s"$tgtAlias.$c = $e" }.mkString(", ")
    val insertCols = colNames.mkString(", ")
    val insertVals = inserts.mkString(", ")
    val sourceRel = timeExpr.map(t => s"$srcName $t").getOrElse(srcName)
    val deleteClause = delExpr.map(d => s"\nWHEN MATCHED AND $d THEN DELETE").getOrElse("")

    s"""MERGE INTO $tgtName AS $tgtAlias
       |USING $sourceRel AS $srcAlias
       |ON $joinExpr$deleteClause
       |WHEN MATCHED THEN UPDATE SET $setClause
       |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }
}
