package graft

import org.apache.spark.sql.functions._

import graft.sources.DeltaLite

/** GraftCatalog's name↔path resolution edges: normalization (case,
  * backticks), the dotted-name requirement, the three-mechanism
  * resolution order, and the Spark-catalog-table-location rule the
  * ExtensionsSpec twins don't reach.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("names normalize: backticks and case fold to one binding; " +
    "single-part names refuse at register AND resolve") {
    val p = java.nio.file.Files.createTempDirectory("graft_cat").toString
    GraftCatalog.registerTable(spark, "`MyDb`.`Events`", p)
    assert(GraftCatalog.resolve(spark, "mydb.events") == p)
    assert(GraftCatalog.resolve(spark, "MYDB.EVENTS") == p)
    assert(GraftCatalog.listTables(spark).exists(_._1 == "mydb.events"))
    intercept[IllegalArgumentException](
      GraftCatalog.registerTable(spark, "plain", p))
    intercept[IllegalArgumentException](
      GraftCatalog.resolve(spark, "plain"))
    assert(GraftCatalog.unregisterTable(spark, "MyDb.Events"))
    assert(!GraftCatalog.unregisterTable(spark, "mydb.events"),
      "second unregister reports nothing removed")
  }

  test("resolution order: explicit binding beats a catalog table's " +
    "location, which beats the database-location convention; the " +
    "error names all three mechanisms") {
    val base = java.nio.file.Files.createTempDirectory("graft_cat3")
      .toString
    // mechanism 3: database location roots <db>/<table>
    spark.sql(s"CREATE DATABASE IF NOT EXISTS catdb LOCATION '$base/dbloc'")
    assert(GraftCatalog.resolve(spark, "catdb.sometable")
      .endsWith("dbloc/sometable"))
    // mechanism 2: a catalog table's own location overrides the
    // convention (external table registered at an unrelated path)
    val t2 = s"$base/elsewhere/t2"
    DeltaLite.commit(spark, t2, Seq((1L, "a")).toDF("k", "s"))
    spark.sql("DROP TABLE IF EXISTS catdb.sometable")
    spark.sql(s"CREATE TABLE catdb.sometable (k BIGINT) USING parquet " +
      s"LOCATION '$t2'")
    assert(GraftCatalog.resolve(spark, "catdb.sometable")
      .endsWith("elsewhere/t2"))
    // mechanism 1: an explicit binding beats both
    GraftCatalog.registerTable(spark, "catdb.sometable", s"$base/explicit")
    assert(GraftCatalog.resolve(spark, "catdb.sometable")
      .endsWith("explicit"))
    GraftCatalog.unregisterTable(spark, "catdb.sometable")

    val e = intercept[RuntimeException](
      GraftCatalog.resolve(spark, "nodb.notable"))
    assert(e.getMessage.contains("REGISTER TABLE") &&
      e.getMessage.contains("database"),
      s"the error must name the mechanisms tried: ${e.getMessage}")
  }
}
