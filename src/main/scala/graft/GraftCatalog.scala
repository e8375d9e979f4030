package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** NAME → PATH resolution for `db.table`-addressed lakehouse tables —
  * the reference's own addressing idiom (every script drives
  * `{DATABASE_NAME}.{TABLE_NAME}` through CREATE DATABASE / OPTIMIZE /
  * ANALYZE SQL strings; tasks/Query History API to
  * Delta_withmetrics.py:76,256,260), layered over Spark's session
  * catalog so the flow needs ZERO proprietary machinery:
  *
  *   1. an explicit [[registerTable]] entry (session-scoped) wins;
  *   2. else a Spark-catalog TABLE `db.t` with a location resolves to
  *      that location (external tables registered any other way);
  *   3. else a Spark-catalog DATABASE `db` resolves to
  *      `<database location>/<table>` — so the reference's literal
  *      `CREATE DATABASE IF NOT EXISTS dbadb LOCATION '...'` followed by
  *      `OPTIMIZE dbadb.query_history` works with no registration call
  *      at all (the database's location is the table root convention,
  *      exactly how managed tables lay out under a schema).
  *
  * The registry is per-SparkSession (weak-keyed — sessions are not
  * pinned) and holds PATHS only, never data: resolution is a map probe
  * plus at most two catalog lookups, so name-addressed verbs cost the
  * same as path-addressed ones at any scale.
  */
object GraftCatalog {

  private val registries =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, String]]())

  private def registry(spark: SparkSession)
      : scala.collection.concurrent.TrieMap[String, String] =
    registries.synchronized {
      var r = registries.get(spark)
      if (r == null) {
        r = scala.collection.concurrent.TrieMap.empty[String, String]
        registries.put(spark, r)
      }
      r
    }

  private def normalize(name: String): String =
    name.split('.').map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).mkString(".").toLowerCase

  /** Bind `db.table` to a table root path for this session. The name
    * must be dotted (single-part names stay Spark's own namespace).
    */
  def registerTable(spark: SparkSession, name: String, path: String): Unit = {
    val n = normalize(name)
    require(n.contains("."),
      s"$name: register dotted db.table names (single-part names belong " +
        "to Spark's own catalog)")
    registry(spark).put(n, path): Unit
  }

  /** Drop an explicit binding (catalog-derived resolution unaffected). */
  def unregisterTable(spark: SparkSession, name: String): Boolean =
    registry(spark).remove(normalize(name)).isDefined

  /** Explicit bindings of this session, sorted by name. */
  def listTables(spark: SparkSession): Seq[(String, String)] =
    registry(spark).toSeq.sortBy(_._1)

  /** Registry-ONLY probe (no catalog fallback) — for verbs that collide
    * with native Spark grammar on targets that need not be graft-format
    * tables (MSCK REPAIR on raw hive-layout dirs): only an explicitly
    * registered name intercepts, so an ordinary catalog table's native
    * statement is never shadowed.
    */
  def registered(spark: SparkSession, name: String): Option[String] =
    registry(spark).get(normalize(name))

  /** Resolve a dotted `db.table` name to its table root path, or a
    * clear error naming every mechanism that was tried.
    */
  def resolve(spark: SparkSession, name: String): String = {
    val n = normalize(name)
    require(n.contains("."),
      s"$name: table names must be dotted db.table here")
    registry(spark).get(n).getOrElse {
      val parts = n.split('.')
      val (db, tbl) = (parts.dropRight(1).mkString("."), parts.last)
      val catalog = spark.sessionState.catalog
      val fromTable: Option[String] =
        try {
          val id = TableIdentifier(tbl, Some(db))
          if (catalog.tableExists(id))
            Option(catalog.getTableMetadata(id).location).map(_.toString)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      fromTable.orElse {
        try {
          if (catalog.databaseExists(db))
            Some(new Path(
              new Path(catalog.getDatabaseMetadata(db).locationUri),
              tbl).toString)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }.getOrElse(sys.error(
        s"$name: unresolvable — not registered (GraftCatalog.registerTable" +
          " / REGISTER TABLE), no catalog table with a location, and no " +
          s"database '$db' whose location could root it"))
    }
  }
}
