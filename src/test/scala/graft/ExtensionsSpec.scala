package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  /** A second session over the same SparkContext, with GraftExtensions
    * injected (builder extensions apply at session construction, so the
    * shared test session can't be reused here).
    */
  lazy val extSpark: SparkSession = {
    TestSpark.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  test("native expressions are callable from SQL") {
    val dot = extSpark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .first().getDouble(0)
    assert(dot == 11.0)

    val sh = extSpark.sql(
      "SELECT size(graft_shingle_hashes('a b c d', 3)) AS n").first().getInt(0)
    assert(sh == 2) // "a b c", "b c d"

    val fp = extSpark.sql(
      "SELECT size(graft_winnow_fingerprints('hello world hello', 4, 2)) AS n")
      .first().getInt(0)
    assert(fp > 0)

    val b = extSpark.sql(
      "SELECT graft_cosine_lsh_bucket(array_repeat(CAST(0.5 AS FLOAT), 64), 8) AS b")
      .first().getLong(0)
    assert(b >= 0 && b < 256)

    val ng = extSpark.sql(
      "SELECT graft_word_ngrams('a b c', 2) AS g").first().getSeq[String](0)
    assert(ng == Seq("a b", "b c"))

    val pii = extSpark.sql(
      "SELECT graft_pii_scrub('mail a@b.co or +1-555-0199-123 at 1.2.3.4') AS p")
      .select("p.scrubbed", "p.n_email", "p.n_phone", "p.n_ip").first()
    assert(pii.getString(0) == "mail <EMAIL> or <PHONE> at <IP>")
    assert((pii.getInt(1), pii.getInt(2), pii.getInt(3)) == ((1, 1, 1)))

    // md5-KM perms: k values, perm 0 = first 8 digest bytes as a long
    val perms = extSpark.sql(
      "SELECT graft_minhash_perms('shingle', 4) AS p").first().getSeq[Long](0)
    assert(perms.length == 4)
    val bytes = "shingle".getBytes("UTF-8")
    assert(perms.head ==
      graft.functions.PortableHash.md5Long(bytes, 0, bytes.length))

    // wrong input type is an analysis error, not silent garbage
    intercept[Exception] {
      extSpark.sql("SELECT graft_vec_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    // invalid size parameters fail analysis too (never corrupt byte math)
    intercept[Exception] {
      extSpark.sql("SELECT graft_word_ngrams('a b', 0)").collect()
    }
    intercept[Exception] {
      extSpark.sql("SELECT graft_winnow_fingerprints('abc', -1, 4)").collect()
    }
  }

  test("SQL and Column APIs agree") {
    import extSpark.implicits._
    val viaSql = extSpark.sql(
      "SELECT graft_shingle_hashes('x y z w', 3) AS h").as[Seq[Long]].first()
    val viaScala = graft.functions.Sketch.shingleHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString("x y z w"), 3).toSeq
    assert(viaSql == viaScala)
  }

  test("SQL maintenance verbs (OPTIMIZE / VACUUM / DESCRIBE HISTORY / " +
    "DESCRIBE DETAIL / RESTORE) dispatch to the programmatic APIs") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_sqlverbs")
      .toString
    val t = s"$base/d"
    DeltaLite.commit(extSpark, t,
      (0L until 30L).map(k => (k, s"p$k")).toDF("k", "s").repartition(3))
    DeltaLite.commit(extSpark, t,
      (30L until 40L).map(k => (k, s"p$k")).toDF("k", "s"))

    val h = extSpark.sql(s"DESCRIBE HISTORY '$t'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(h.map(_._1) == Seq(0L, 1L) && h.forall(_._2 == "WRITE"))

    val o = extSpark.sql(s"OPTIMIZE '$t'").collect().head
    assert(o.getLong(0) == 2L && o.getString(1) == "OPTIMIZE")
    assert(DeltaLite.snapshot(extSpark, t).files.size == 1,
      "SQL OPTIMIZE must bin-pack like the API")

    val d = extSpark.sql(s"DESCRIBE DETAIL '$t'").collect().head
    assert(d.getString(0) == "delta" && d.getLong(1) == 2L &&
      d.getLong(2) == 1L && d.getLong(3) > 0L)

    val r = extSpark.sql(s"RESTORE '$t' VERSION AS OF 0").collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 3L)
    assert(DeltaLite.read(extSpark, t).count() == 30L,
      "SQL RESTORE must roll the visible state back")

    val reaped = extSpark.sql(s"VACUUM '$t' RETAIN 1 VERSIONS")
      .collect().map(_.getString(0))
    assert(reaped.nonEmpty, "VACUUM must reap the unreferenced files")
    assert(DeltaLite.read(extSpark, t).count() == 30L)

    // Iceberg side: format auto-detected from the path
    val ti = s"$base/i"
    IcebergLite.commit(extSpark, ti,
      (0L until 40L).map(k => (k, k * 2.0)).toDF("k", "v").repartition(4))
    extSpark.sql(s"OPTIMIZE '$ti' ZORDER BY (k) FILES 2")
    assert(IcebergLite.snapshot(extSpark, ti).detail.size == 2,
      "SQL OPTIMIZE ZORDER must re-cluster like the API")
    val di = extSpark.sql(s"DESCRIBE DETAIL '$ti'").collect().head
    assert(di.getString(0) == "iceberg" && di.getLong(2) == 2L)
    val hi = extSpark.sql(s"DESCRIBE HISTORY '$ti'").collect()
    assert(hi.length == 2)
    extSpark.sql(s"RESTORE '$ti' VERSION AS OF 0")
    assert(IcebergLite.read(extSpark, ti).count() == 40L)

    // ANALYZE: per-column stats over the current (restored) state
    val stats = extSpark.sql(s"ANALYZE TABLE '$t' COMPUTE STATISTICS")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(stats("k")._1 == "0" && stats("k")._2 == "29" &&
      stats("k")._3 == 0L && stats("k")._4 >= 28L,
      s"ANALYZE stats off: ${stats("k")}")

    // everything else still parses through Spark's own parser
    assert(extSpark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
    // and a verb against a non-table path refuses loudly
    val e = intercept[RuntimeException](
      extSpark.sql(s"DESCRIBE DETAIL '$base/nope'").collect())
    assert(e.getMessage.contains("neither"))
  }

  test("SHOW FILES / SHOW PARTITIONS expose the metadata tables; rows " +
    "equal the programmatic files()/partitions() APIs on both formats") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_showfiles")
      .toString

    // Iceberg, transform-partitioned: rows are MANIFEST metadata only
    val ti = s"$base/i"
    val df = (0L until 40L).toDF("id").coalesce(1)
      .withColumn("ts", to_timestamp(concat(lit("2024-01-0"),
        (col("id") % 4 + 1).cast("string"), lit(" 10:00:00"))))
    IcebergLite.commit(extSpark, ti, df,
      partitionTransforms = Seq("days(ts)"))
    val sqlRows = extSpark.sql(s"SHOW FILES IN '$ti'")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val apiRows = IcebergLite.files(extSpark, ti)
      .select("path", "record_count", "size_bytes", "partition")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(sqlRows == apiRows && sqlRows.nonEmpty,
      s"SHOW FILES must equal files(): sql=$sqlRows api=$apiRows")
    assert(sqlRows.forall(_._4 != null) &&
      sqlRows.map(_._4).exists(_.startsWith("ts_day=")),
      "transform partition tuples must surface")
    assert(sqlRows.toSeq.map(_._2).sum == 40L,
      "manifest record counts must sum to the table")
    val sqlParts = extSpark.sql(s"SHOW PARTITIONS '$ti'")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val apiParts = IcebergLite.partitions(extSpark, ti)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlParts == apiParts && sqlParts.size == 4,
      s"SHOW PARTITIONS off: sql=$sqlParts api=$apiParts")

    // Delta, hive-partitioned: record counts from the log's add-stats
    val td = s"$base/d"
    DeltaLite.commit(extSpark, td,
      (0L until 30L).map(k => (k, s"g${k % 3}")).toDF("k", "g"),
      partitionBy = Seq("g"))
    val dRows = extSpark.sql(s"SHOW FILES IN '$td'").collect()
    assert(dRows.nonEmpty && dRows.forall(r =>
      r.getString(3).startsWith("g=") && r.getLong(2) > 0L))
    assert(dRows.map(_.getLong(1)).sum == 30L,
      "add-stats record counts must sum to the table")
    val dParts = extSpark.sql(s"SHOW PARTITIONS '$td'")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(dParts.keySet == Set("g=g0", "g=g1", "g=g2") &&
      dParts.values.sum == 30L, s"got $dParts")
  }

  test("r14 verbs: ADD/DROP CONSTRAINT, CREATE/DROP BRANCH + TAG, " +
    "FAST FORWARD, REMOVE ORPHAN FILES, CLEANUP LOGS — SQL effects " +
    "equal the programmatic APIs") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_r14verbs")
      .toString

    // Delta: constraint lifecycle through SQL
    val t = s"$base/d"
    DeltaLite.commit(extSpark, t, Seq((1L, 5.0), (2L, 7.0)).toDF("k", "amt"))
    extSpark.sql(s"ALTER TABLE '$t' ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    intercept[IllegalArgumentException](DeltaLite.commit(extSpark, t,
      Seq((3L, -1.0)).toDF("k", "amt")))
    extSpark.sql(s"ALTER TABLE '$t' DROP CONSTRAINT amt_pos")
    DeltaLite.commit(extSpark, t, Seq((3L, -1.0)).toDF("k", "amt"))
    assert(DeltaLite.read(extSpark, t).count() == 3L)
    // CLEANUP LOGS: checkpoint, then the below-checkpoint commits go
    DeltaLite.checkpoint(extSpark, t)
    val cleaned = extSpark.sql(s"CLEANUP LOGS '$t' RETAIN 1 VERSIONS")
      .collect().map(_.getString(0))
    assert(cleaned.nonEmpty && DeltaLite.read(extSpark, t).count() == 3L)

    // Iceberg: WAP through SQL
    val ti = s"$base/i"
    IcebergLite.commit(extSpark, ti, Seq((1L, "a")).toDF("k", "s"))
    extSpark.sql(s"ALTER TABLE '$ti' CREATE BRANCH staging")
    IcebergLite.commitToBranch(extSpark, ti, "staging",
      Seq((2L, "b")).toDF("k", "s"))
    assert(IcebergLite.read(extSpark, ti).count() == 1L)
    extSpark.sql(s"ALTER TABLE '$ti' FAST FORWARD staging")
    assert(IcebergLite.read(extSpark, ti).count() == 2L)
    extSpark.sql(s"ALTER TABLE '$ti' CREATE TAG v1 AT 0")
    assert(IcebergLite.tableRefs(extSpark, ti)("v1") == (0L, "tag"))
    extSpark.sql(s"ALTER TABLE '$ti' DROP TAG v1")
    assert(!IcebergLite.tableRefs(extSpark, ti).contains("v1"))

    // REMOVE ORPHAN FILES: planted debris goes, live reads intact
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ti, "data", "part-zz-junk.parquet"),
      Array[Byte](1))
    val gone = extSpark.sql(s"REMOVE ORPHAN FILES FROM '$ti'")
      .collect().map(_.getString(0))
    assert(gone.contains("data/part-zz-junk.parquet"))
    assert(IcebergLite.read(extSpark, ti).count() == 2L)

    // format guards: wrong-surface verbs refuse loudly
    intercept[RuntimeException](
      extSpark.sql(s"ALTER TABLE '$ti' ADD CONSTRAINT c CHECK (k > 0)"))
    intercept[RuntimeException](
      extSpark.sql(s"ALTER TABLE '$t' CREATE BRANCH b"))
  }

  test("CLUSTER BY verb: declare through SQL, OPTIMIZE re-clusters by " +
    "the declared keys, CLUSTER BY NONE drops; Iceberg refuses") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_liqverb")
      .toString
    val t = s"$base/d"
    DeltaLite.commit(extSpark, t,
      (0L until 1000L).map(k => (k, s"v$k")).toDF("k", "s")
        .repartition(4))
    val declared = extSpark.sql(s"ALTER TABLE '$t' CLUSTER BY (k)")
      .collect().head
    assert(declared.getString(1) == "CLUSTER BY (k)")
    assert(DeltaLite.clusteringColumns(extSpark, t).contains(Seq("k")))
    extSpark.sql(s"OPTIMIZE '$t' FILES 4")
    val scan = DeltaLite.readWhere(extSpark, t, "k", 0L, 99L)
    assert(scan.filesSkipped >= 2,
      s"SQL-declared clustering must drive OPTIMIZE: $scan")
    extSpark.sql(s"ALTER TABLE '$t' CLUSTER BY NONE")
    assert(DeltaLite.clusteringColumns(extSpark, t).isEmpty)

    val ti = s"$base/i"
    IcebergLite.commit(extSpark, ti, Seq((1L, "a")).toDF("k", "s"))
    intercept[RuntimeException](
      extSpark.sql(s"ALTER TABLE '$ti' CLUSTER BY (k)"))
  }

  test("SHOW TBLPROPERTIES surfaces both formats' property maps; " +
    "VACUUM RETAIN n HOURS retains by ICT wall clock and REFUSES " +
    "zero-stamp logs instead of maximally deleting") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_props")
      .toString
    val t = s"$base/d"
    DeltaLite.commit(extSpark, t,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s").repartition(2))
    DeltaLite.setTableProperty(extSpark, t, "delta.appendOnly", "false")
    DeltaLite.setTableProperty(extSpark, t, "graft.owner", "dba")
    val props = extSpark.sql(s"SHOW TBLPROPERTIES '$t'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.owner").contains("dba"))
    assert(props.get("delta.appendOnly").contains("false"))

    val ti = s"$base/i"
    IcebergLite.commit(extSpark, ti, Seq((1L, "a")).toDF("k", "s"))
    IcebergLite.setProperty(extSpark, ti, "graft.owner", "dba")
    val iprops = extSpark.sql(s"SHOW TBLPROPERTIES '$ti'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(iprops.get("graft.owner").contains("dba"))

    // a ZERO-STAMP log refuses the wall-clock flavor — silently keeping
    // only the tip would be maximal deletion from a conservative command
    DeltaLite.commit(extSpark, t,
      (0L until 50L).map(k => (k, s"w$k")).toDF("k", "s"),
      overwrite = true)
    intercept[Exception](extSpark.sql(s"VACUUM '$t' RETAIN 168 HOURS"))

    // with ICT the stamps are real: a wide window reaps nothing, a
    // zero-hour window keeps the version current at the cutoff (the
    // tip) and reaps the files only older versions reference
    DeltaLite.enableInCommitTimestamps(extSpark, t)
    DeltaLite.commit(extSpark, t,
      (0L until 20L).map(k => (k, s"x$k")).toDF("k", "s"),
      overwrite = true)
    assert(extSpark.sql(s"VACUUM '$t' RETAIN 1000000 HOURS").count() == 0L)
    assert(DeltaLite.read(extSpark, t).count() == 20L)
    val reaped = extSpark.sql(s"VACUUM '$t' RETAIN 0 HOURS").count()
    assert(reaped > 0L, "files referenced only by pre-window versions reap")
    assert(DeltaLite.read(extSpark, t).count() == 20L)

    // Iceberg: our writer zeroes timestamp-ms, so the wall-clock flavor
    // refuses with the version-count remedy named; the version-count
    // flavor still reaps
    IcebergLite.commit(extSpark, ti, Seq((2L, "b")).toDF("k", "s"),
      overwrite = true)
    intercept[Exception](extSpark.sql(s"VACUUM '$ti' RETAIN 168 HOURS"))
    assert(extSpark.sql(s"VACUUM '$ti' RETAIN 1 VERSIONS").count() > 0L)
    assert(IcebergLite.read(extSpark, ti).as[(Long, String)].collect()
      .toSeq == Seq((2L, "b")))
  }

  test("ADD/DROP PARTITION FIELD verbs evolve the Iceberg spec through " +
    "SQL; duplicates and unknown fields refuse; Delta refuses") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_specverb")
      .toString
    val t = s"$base/i"
    IcebergLite.commit(extSpark, t,
      Seq((1L, 10L, "x")).toDF("id", "grp", "s"),
      partitionTransforms = Seq("bucket(4, id)"))
    val added = extSpark.sql(
      s"ALTER TABLE '$t' ADD PARTITION FIELD bucket(2, grp)").collect()
    assert(added.head.getLong(0) == 1L)
    assert(IcebergLite.currentSpecDecls(extSpark, t).size == 2)
    intercept[RuntimeException](extSpark.sql(
      s"ALTER TABLE '$t' ADD PARTITION FIELD bucket(2, grp)"))
    extSpark.sql(s"ALTER TABLE '$t' DROP PARTITION FIELD bucket(4, id)")
    assert(IcebergLite.currentSpecDecls(extSpark, t) ==
      Seq("bucket(2, grp)"))
    intercept[RuntimeException](extSpark.sql(
      s"ALTER TABLE '$t' DROP PARTITION FIELD bucket(4, id)"))

    val td = s"$base/d"
    DeltaLite.commit(extSpark, td, Seq((1L, "a")).toDF("k", "s"))
    intercept[RuntimeException](extSpark.sql(
      s"ALTER TABLE '$td' ADD PARTITION FIELD bucket(2, k)"))
  }

  test("catalog-named tables: every verb accepts db.table — explicit " +
    "REGISTER TABLE bindings, then CREATE DATABASE ... LOCATION " +
    "convention (the reference's own flow), path forms unchanged") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_catverbs")
      .toString

    // mechanism 1: explicit registration binds any path to db.table
    val t = s"$base/elsewhere/history"
    DeltaLite.commit(extSpark, t,
      (0L until 30L).map(k => (k, s"p$k")).toDF("k", "s").repartition(3))
    extSpark.sql(s"REGISTER TABLE dbadb.query_history AT '$t'")
    val h = extSpark.sql("DESCRIBE HISTORY dbadb.query_history").collect()
    assert(h.length == 1 && h.head.getString(1) == "WRITE")
    // the reference's literal maintenance line, name-addressed
    val o = extSpark.sql("OPTIMIZE dbadb.query_history").collect().head
    assert(o.getLong(0) == 1L && o.getString(1) == "OPTIMIZE")
    assert(DeltaLite.snapshot(extSpark, t).files.size == 1,
      "name-addressed OPTIMIZE must hit the registered path")
    val stats = extSpark.sql(
      "ANALYZE TABLE dbadb.query_history COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(stats("k") == "29")
    val props = extSpark.sql("SHOW TBLPROPERTIES dbadb.query_history")
    assert(props.columns.toSeq == Seq("key", "value"))
    // name and path forms are the SAME table
    assert(extSpark.sql(s"DESCRIBE DETAIL '$t'").collect().head.getLong(2) ==
      extSpark.sql("DESCRIBE DETAIL dbadb.query_history").collect()
        .head.getLong(2))

    // mechanism 2: CREATE DATABASE ... LOCATION roots db.table under
    // the database location with ZERO registration — the reference's
    // CREATE DATABASE IF NOT EXISTS + OPTIMIZE db.t flow verbatim
    val dbLoc = s"$base/dbloc"
    extSpark.sql(s"CREATE DATABASE IF NOT EXISTS dbaconv LOCATION '$dbLoc'")
    val ti = s"$dbLoc/events_iceberg"
    IcebergLite.commit(extSpark, ti,
      (0L until 40L).map(k => (k, k * 2.0)).toDF("k", "v").repartition(4))
    val oi = extSpark.sql(
      "OPTIMIZE dbaconv.events_iceberg ZORDER BY (k) FILES 2").collect().head
    assert(oi.getString(1).startsWith("OPTIMIZE ZORDER"))
    assert(IcebergLite.snapshot(extSpark, ti).detail.size == 2)
    extSpark.sql("ALTER TABLE dbaconv.events_iceberg CREATE TAG v1 AT 0")
    assert(IcebergLite.tableRefs(extSpark, ti)("v1") == (0L, "tag"))
    assert(extSpark.sql("SHOW FILES IN dbaconv.events_iceberg").count() == 2L)

    // UNREGISTER drops the explicit binding; resolution then fails loudly
    extSpark.sql("UNREGISTER TABLE dbadb.query_history")
    val e = intercept[RuntimeException](
      extSpark.sql("DESCRIBE HISTORY dbadb.query_history").collect())
    assert(e.getMessage.contains("unresolvable"))

    // single-part identifiers are NOT intercepted: native Spark
    // statements on plain names still reach Spark's own parser
    assert(GraftSqlVerbs.parseVerb("SHOW TBLPROPERTIES plainview").isEmpty)
    assert(GraftSqlVerbs.parseVerb("ANALYZE TABLE plain COMPUTE STATISTICS")
      .isEmpty)
    assert(GraftSqlVerbs.parseVerb(
      "ALTER TABLE plain ALTER COLUMN k TYPE long").isEmpty)
    // ...while their dotted twins are
    assert(GraftSqlVerbs.parseVerb("SHOW TBLPROPERTIES db.t").nonEmpty)
  }

  test("MSCK REPAIR TABLE: discovers hive-layout partitions (escaped " +
    "values and the null marker decoded), path and registered-name " +
    "addressed; Delta roots refuse; unregistered names fall through " +
    "to Spark") {
    import extSpark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_msck").toString
    val t = s"$base/hive_tbl"
    // hive layout written EXTERNALLY (partitionBy writer), incl. an
    // escaped value and a null partition
    Seq((1L, "a", "x y"), (2L, "b", "x y"), (3L, "c", null),
        (4L, "d", "plain"))
      .toDF("k", "s", "p")
      .write.partitionBy("p").parquet(t)

    val byPath = extSpark.sql(s"MSCK REPAIR TABLE '$t'").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPath.keySet == Set("p=x y", "p=__HIVE_DEFAULT_PARTITION__",
      "p=plain"), s"got ${byPath.keySet}")
    assert(byPath("p=x y") >= 1L)

    // name-addressed through the registry
    extSpark.sql(s"REGISTER TABLE hivedb.tbl AT '$t'")
    assert(extSpark.sql("MSCK REPAIR TABLE hivedb.tbl").count() == 3L)
    extSpark.sql("UNREGISTER TABLE hivedb.tbl")

    // an UNREGISTERED dotted name falls through to Spark's native MSCK
    // (whose error names the missing catalog table, not graft)
    val e = intercept[Exception](
      extSpark.sql("MSCK REPAIR TABLE nosuch.tbl").collect())
    assert(!e.getMessage.contains("unresolvable"),
      s"native MSCK must handle unregistered names: ${e.getMessage}")

    // a Delta root refuses with the remedy named
    val td = s"$base/delta_tbl"
    graft.sources.DeltaLite.commit(extSpark, td,
      Seq((1L, "a")).toDF("k", "s"))
    val ed = intercept[RuntimeException](
      extSpark.sql(s"MSCK REPAIR TABLE '$td'").collect())
    assert(ed.getMessage.contains("SHOW PARTITIONS"))

    // an unpartitioned plain dir refuses loudly
    val tp = s"$base/plain_dir"
    Seq((1L, "a")).toDF("k", "s").write.parquet(tp)
    val ep = intercept[Exception](
      extSpark.sql(s"MSCK REPAIR TABLE '$tp'").collect())
    assert(ep.getMessage.contains("no k=v partition"))
  }

  test("colliding verb shapes on an ORDINARY dotted catalog table fall " +
    "through to Spark's parser — installing the extension never " +
    "shadows native statements") {
    val loc = java.nio.file.Files.createTempDirectory("graft_plain")
      .toString + "/plain"
    extSpark.sql("CREATE DATABASE IF NOT EXISTS plaindb")
    extSpark.sql("DROP TABLE IF EXISTS plaindb.plain")
    extSpark.sql(s"CREATE TABLE plaindb.plain (k INT) USING parquet " +
      s"LOCATION '$loc'")
    extSpark.sql("INSERT OVERWRITE plaindb.plain VALUES (1), (2), (3)")
    // native ANALYZE returns no rows and no columns; graft's returns a
    // per-column stats frame — the empty schema proves Spark handled it
    assert(extSpark.sql(
      "ANALYZE TABLE plaindb.plain COMPUTE STATISTICS").columns.isEmpty,
      "ANALYZE on a plain catalog table must stay native")
    // native SHOW TBLPROPERTIES works (graft's would error: the table
    // location is neither a DeltaLite nor an IcebergLite root)
    extSpark.sql("SHOW TBLPROPERTIES plaindb.plain").collect()
    assert(extSpark.sql("SELECT COUNT(*) FROM plaindb.plain")
      .head().getLong(0) == 3L)
    // graft-only keywords still intercept on unresolvable names (loud
    // resolve error, not a Spark parse error)
    val e = intercept[RuntimeException](
      extSpark.sql("DESCRIBE HISTORY nosuchdb.nosuch").collect())
    assert(e.getMessage.contains("unresolvable"))
  }

  test("ALTER COLUMN TYPE verb widens through SQL; Iceberg refuses") {
    import extSpark.implicits._
    import graft.sources.{DeltaLite, IcebergLite}
    val base = java.nio.file.Files.createTempDirectory("graft_widenverb")
      .toString
    val t = s"$base/d"
    DeltaLite.commit(extSpark, t,
      Seq((1, 2.5f), (7, 3.5f)).toDF("k", "f"))
    extSpark.sql(s"ALTER TABLE '$t' ALTER COLUMN k TYPE long")
    extSpark.sql(s"ALTER TABLE '$t' ALTER COLUMN f TYPE double")
    val df = DeltaLite.read(extSpark, t)
    assert(df.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.filter($"k" === 7L).head().getDouble(1) == 3.5)
    intercept[RuntimeException](extSpark.sql(
      s"ALTER TABLE '$t' ALTER COLUMN k TYPE integer"))

    val ti = s"$base/i"
    IcebergLite.commit(extSpark, ti, Seq((1, "a")).toDF("k", "s"))
    intercept[RuntimeException](extSpark.sql(
      s"ALTER TABLE '$ti' ALTER COLUMN k TYPE long"))
  }

  test("SHOW TABLES twin: native rows reproduced, registry rows appended; " +
    "no registrations = no interception (native untouched)") {
    import extSpark.implicits._
    import graft.sources.DeltaLite
    // start from a clean registry regardless of suite ordering
    GraftCatalog.listTables(extSpark).foreach { case (n, _) =>
      GraftCatalog.unregisterTable(extSpark, n) }

    extSpark.sql("CREATE OR REPLACE TEMP VIEW show_tables_probe AS SELECT 1 AS x")
    // empty registry → shouldIntercept is false → Spark's own SHOW TABLES
    assert(GraftSqlVerbs.parseVerb("SHOW TABLES").nonEmpty)
    assert(!GraftSqlVerbs.shouldIntercept(Some(extSpark),
      GraftShowTablesCommand(None)))
    val nativeOnly = extSpark.sql("SHOW TABLES").collect()
    assert(nativeOnly.exists(_.getString(1) == "show_tables_probe"))

    val base = java.nio.file.Files.createTempDirectory("graft_showtables")
      .toString
    val t1 = s"$base/t1"
    DeltaLite.commit(extSpark, t1, Seq((1L, "a")).toDF("k", "s"))
    extSpark.sql(s"REGISTER TABLE dbadb.reg_one AT '$t1'")
    extSpark.sql(s"REGISTER TABLE otherdb.reg_two AT '$t1'")

    // intercepted now: native listing (the temp view) PLUS both registrations
    val all = extSpark.sql("SHOW TABLES").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(all.exists(_._2 == "show_tables_probe"),
      "native rows must survive interception")
    assert(all(("dbadb", "reg_one")) && all(("otherdb", "reg_two")))

    // IN db filters registry rows to that db
    val inDb = extSpark.sql("SHOW TABLES IN dbadb").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(inDb(("dbadb", "reg_one")) && !inDb.exists(_._2 == "reg_two"))

    // LIKE-pattern form stays native (not matched by the twin at all)
    assert(GraftSqlVerbs.parseVerb("SHOW TABLES LIKE 'x*'").isEmpty)
    assert(GraftSqlVerbs.parseVerb("SHOW TABLES IN db LIKE 'x*'").isEmpty)

    // strict-superset contract: a db in NEITHER the native catalog NOR
    // the registry surfaces native's NoSuchDatabaseException even while
    // the twin intercepts (an empty result would silence a native error)
    val ex = intercept[Exception](
      extSpark.sql("SHOW TABLES IN graft_no_such_db").collect())
    assert(ex.getMessage.toLowerCase.contains("graft_no_such_db"),
      s"expected the native unknown-database error, got: ${ex.getMessage}")

    extSpark.sql("UNREGISTER TABLE dbadb.reg_one")
    extSpark.sql("UNREGISTER TABLE otherdb.reg_two")
  }

  test("DESCRIBE EXTENDED <t> <col> twin: B5 stats surface for graft " +
    "tables, path- and registered-name-addressed; catalog tables and " +
    "single-part names never shadowed") {
    import extSpark.implicits._
    import graft.sources.DeltaLite
    val base = java.nio.file.Files.createTempDirectory("graft_desccol")
      .toString
    val t = s"$base/d"
    DeltaLite.commit(extSpark, t,
      ((0L until 20L).map(k => (k, s"v$k")) :+ (99L, null.asInstanceOf[String]))
        .toDF("k", "s"))

    val byPath = extSpark.sql(s"DESCRIBE EXTENDED '$t' k").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byPath("col_name") == "k")
    assert(byPath("data_type") == "bigint")
    assert(byPath("min") == "0" && byPath("max") == "99")
    assert(byPath("num_nulls") == "0")
    assert(byPath("distinct_count").toLong >= 20L)

    val sStats = extSpark.sql(s"DESCRIBE EXTENDED '$t' s").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sStats("num_nulls") == "1")

    // registered-name addressing serves the same surface
    extSpark.sql(s"REGISTER TABLE dbadb.desc_probe AT '$t'")
    val byName = extSpark.sql("DESCRIBE EXTENDED dbadb.desc_probe k")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName == byPath)
    extSpark.sql("UNREGISTER TABLE dbadb.desc_probe")

    // a bogus column errors loudly, naming the real ones
    extSpark.sql(s"REGISTER TABLE dbadb.desc_probe AT '$t'")
    val ec = intercept[RuntimeException](
      extSpark.sql("DESCRIBE EXTENDED dbadb.desc_probe nope").collect())
    assert(ec.getMessage.contains("no column 'nope'"))
    extSpark.sql("UNREGISTER TABLE dbadb.desc_probe")

    // an UNregistered dotted name falls through to native DESCRIBE
    // (whose error names the missing table, not graft resolution)
    val en = intercept[Exception](
      extSpark.sql("DESCRIBE EXTENDED nosuch.tbl k").collect())
    assert(!en.getMessage.contains("unresolvable"),
      s"native DESCRIBE must handle unregistered names: ${en.getMessage}")

    // single-part names and the table-level form never match the twin
    assert(GraftSqlVerbs.parseVerb("DESCRIBE EXTENDED plain k").isEmpty)
    assert(GraftSqlVerbs.parseVerb("DESCRIBE EXTENDED db.t").isEmpty)
    assert(GraftSqlVerbs.parseVerb("DESCRIBE EXTENDED db.t k").nonEmpty)
  }
}
