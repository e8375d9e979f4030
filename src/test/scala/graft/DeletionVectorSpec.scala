package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeletionVectors, DeltaLite}

/** Deletion vectors (merge-on-read DELETE) + column mapping — the r11
  * verdict's #2/#3 real-user gaps: the refusal at reader protocol ≥ 2 is
  * now a read path. Covers the codec primitives (Z85, the portable
  * RoaringBitmapArray), the DV write→read round trip, interaction with
  * every metadata verb (time travel, restore, clone, CDF, vacuum,
  * checkpoint refusal), and column-mapped tables end to end.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_dv").toString + "/t"

  test("Z85 codec round-trips and matches the published test vector") {
    // ZeroMQ RFC 32's reference vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    // encodes as "HelloWorld"
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == bytes.toSeq)
    // arbitrary 16-byte round trip (the UUID shape descriptors use)
    val uuid = Array.tabulate(16)(i => (i * 37 + 11).toByte)
    assert(DeletionVectors.z85Decode(
      DeletionVectors.z85Encode(uuid)).toSeq == uuid.toSeq)
  }

  test("Bitmap64 round-trips through the portable format, including " +
    "row indices past 2^32") {
    val big = (1L << 32) + 7L
    val values = Seq(0L, 1L, 63L, 1024L, 999999L, big)
    val b = DeletionVectors.Bitmap64(values)
    assert(b.cardinality == values.size)
    val back = DeletionVectors.Bitmap64.deserialize(b.serialize())
    values.foreach(v => assert(back.contains(v), s"lost $v"))
    assert(!back.contains(2L) && !back.contains(big + 1))
    assert(back.cardinality == values.size)
    // union keeps both sides
    val other = DeletionVectors.Bitmap64(Seq(2L, big + 1))
    val or = back.or(other)
    (values ++ Seq(2L, big + 1)).foreach(v => assert(or.contains(v)))
  }

  test("deleteVectors hides rows without rewriting data files; time " +
    "travel still sees them; a second delete unions in") {
    val t = newTable()
    val df = (0L until 100L).map(k => (k, s"row$k")).toDF("k", "s")
    DeltaLite.commit(spark, t, df.repartition(2))
    val before = DeltaLite.snapshot(spark, t)
    val dataBytes = before.files.map(p =>
      java.nio.file.Files.size(java.nio.file.Paths.get(t, p)))

    val st = DeltaLite.deleteVectors(spark, t,
      Seq(3L, 7L, 50L).toDF("k"), Seq("k"))
    assert(st.rowsDeleted == 3L)
    val after = DeltaLite.snapshot(spark, t)
    // SAME data files, byte for byte — only the log and a DV sidecar moved
    assert(after.files.toSet == before.files.toSet)
    assert(after.files.map(p =>
      java.nio.file.Files.size(java.nio.file.Paths.get(t, p))) == dataBytes)
    assert(after.dvs.nonEmpty)

    val now = DeltaLite.read(spark, t).select("k").as[Long].collect().toSet
    assert(now == (0L until 100L).toSet -- Set(3L, 7L, 50L))
    // time travel BEFORE the delete sees every row (the format's contract)
    assert(DeltaLite.read(spark, t, Some(0L)).count() == 100L)

    // second delete: existing DVs extend (old ∪ new), already-deleted
    // rows don't recount
    val st2 = DeltaLite.deleteVectors(spark, t,
      Seq(3L, 4L).toDF("k"), Seq("k"))
    assert(st2.rowsDeleted == 1L, "3 was already deleted — only 4 counts")
    assert(DeltaLite.read(spark, t).count() == 96L)
  }

  test("deleteVectors refuses a batch past maxDeleteRows (the " +
    "copy-on-write boundary), leaving the table untouched") {
    val t = newTable()
    DeltaLite.commit(spark, t, (0L until 50L).toDF("k"))
    val v = DeltaLite.snapshot(spark, t).version
    val e = intercept[IllegalArgumentException] {
      DeltaLite.deleteVectors(spark, t, (0L until 40L).toDF("k"),
        Seq("k"), maxDeleteRows = 10)
    }
    assert(e.getMessage.contains("selectiveDelete"))
    assert(DeltaLite.snapshot(spark, t).version == v)
    assert(DeltaLite.read(spark, t).count() == 50L)
  }

  test("the v3 protocol written by deleteVectors is ACCEPTED by this " +
    "reader and refused only for unknown features") {
    val t = newTable()
    DeltaLite.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    DeltaLite.deleteVectors(spark, t, Seq(1L).toDF("k"), Seq("k"))
    // the table now demands minReaderVersion 3 + deletionVectors — the
    // pre-r12 reader refused exactly this; now it reads
    assert(DeltaLite.read(spark, t).select("k").as[Long].collect().toSeq
      == Seq(2L))
    // an unknown reader feature still refuses loudly
    val dir = new java.io.File(s"$t/_delta_log")
    val next = DeltaLite.versions(spark, t).last + 1
    val w = new java.io.FileWriter(new java.io.File(dir, f"$next%020d.json"))
    // (v2Checkpoint graduated to a supported feature in r14, so the
    // canonical unknown here is variant typing, which we don't read)
    w.write("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType"]}}""" + "\n")
    w.close()
    val e = intercept[IllegalArgumentException](DeltaLite.read(spark, t))
    assert(e.getMessage.contains("variantType"))
  }

  test("changes() carries merge-on-read deletes: a DV-only commit nets " +
    "out as delete rows") {
    val t = newTable()
    DeltaLite.commit(spark, t,
      (0L until 20L).map(k => (k, k * 10)).toDF("k", "v"))
    DeltaLite.deleteVectors(spark, t, Seq(5L, 6L).toDF("k"), Seq("k"))
    val cdf = DeltaLite.changes(spark, t, 0L, 1L, Seq("k"))
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(cdf == Set((5L, "delete"), (6L, "delete")))
  }

  test("restore resurrects DV-deleted rows (file identity includes the " +
    "DV); vacuum keeps referenced DV sidecars and reaps orphaned ones") {
    val t = newTable()
    DeltaLite.commit(spark, t, (0L until 30L).toDF("k"))
    DeltaLite.deleteVectors(spark, t, Seq(1L, 2L).toDF("k"), Seq("k"))
    DeltaLite.deleteVectors(spark, t, Seq(3L).toDF("k"), Seq("k"))
    assert(DeltaLite.read(spark, t).count() == 27L)
    // restore to v1 (first delete only) — DV identity must roll back too
    DeltaLite.restore(spark, t, 1L)
    assert(DeltaLite.read(spark, t).count() == 28L)
    // vacuum at retain=1: v1's DV sidecar is still referenced, the
    // superseded v2 sidecar is reapable
    val victims = DeltaLite.vacuum(spark, t, retainVersions = 1)
    assert(victims.exists(_.endsWith(".bin")),
      "superseded DV sidecar should be reaped")
    assert(DeltaLite.read(spark, t).count() == 28L,
      "vacuum must not break the live snapshot's DV")
  }

  test("checkpoint round-trips DV masks, column mapping, protocol " +
    "features, and add-stats — a bootstrap loses nothing") {
    val t = newTable()
    DeltaLite.commit(spark, t,
      (0L until 50L).map(k => (k, s"v$k")).toDF("id", "payload")
        .repartitionByRange(4, col("id")), columnMapping = true)
    DeltaLite.deleteVectors(spark, t, Seq(7L, 8L).toDF("id"), Seq("id"))
    DeltaLite.checkpoint(spark, t)
    // bootstrap proof: the JSON commits BEFORE the checkpoint version
    // are not needed anymore — delete them and read again (the
    // checkpoint version's own JSON stays as the version marker, the
    // protocol's retention shape)
    val logDir = java.nio.file.Paths.get(t, "_delta_log")
    java.nio.file.Files.delete(logDir.resolve(f"${0L}%020d.json"))
    val out = DeltaLite.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload"),
      "mapping must survive the checkpoint")
    assert(out.select("id").as[Long].collect().toSet
      == (0L until 50L).toSet -- Set(7L, 8L),
      "DV masks must survive the checkpoint")
    // add-stats survive too: a key-range read still skips files
    val scan = DeltaLite.readWhere(spark, t, "id", 0L, 9L)
    assert(scan.filesSkipped > 0, "bootstrapped stats must still prune")
    // appends replay on top of the bootstrap
    DeltaLite.commit(spark, t, Seq((100L, "tail")).toDF("id", "payload"))
    assert(DeltaLite.read(spark, t).count() == 49L)
  }

  test("shallowClone carries DV masks (u-descriptors re-anchor to the " +
    "source root)") {
    val t = newTable()
    DeltaLite.commit(spark, t, (0L until 10L).toDF("k"))
    DeltaLite.deleteVectors(spark, t, Seq(4L).toDF("k"), Seq("k"))
    val dst = newTable()
    DeltaLite.shallowClone(spark, t, dst)
    assert(DeltaLite.read(spark, dst).select("k").as[Long].collect().toSet
      == (0L until 10L).toSet - 4L)
  }

  test("column mapping: physical parquet names, logical read, sticky " +
    "across appends, stats-pruned verbs translate the key") {
    val t = newTable()
    val df = (0L until 40L).map(k => (k, s"n$k", k * 1.5))
      .toDF("id", "name", "score")
    DeltaLite.commit(spark, t, df.repartitionByRange(4, col("id")),
      columnMapping = true)
    // the data files must NOT contain logical names
    val snap = DeltaLite.snapshot(spark, t)
    val raw = spark.read.parquet(s"$t/${snap.files.head}")
    assert(raw.columns.forall(_.startsWith("col-")),
      s"physical names expected, got ${raw.columns.mkString(",")}")
    // the table reads under logical names, values intact
    val back = DeltaLite.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(back.filter(col("id") === 7L).select("name").as[String].head()
      == "n7")
    // appends keep the mapping without being asked
    DeltaLite.commit(spark, t,
      Seq((100L, "x", 0.5)).toDF("id", "name", "score"))
    assert(DeltaLite.read(spark, t).count() == 41L)
    // stats-pruned read translates the logical key to the physical
    // stats name — pruning still skips files
    val scan = DeltaLite.readWhere(spark, t, "id", 0L, 9L)
    assert(scan.filesSkipped > 0, "mapped add-stats must still prune")
    assert(scan.df.count() == 10L)
    // selectiveMerge on the mapped table: semantics = full merge
    val updates = Seq((1L, "N1", 9.9), (200L, "new", 1.0))
      .toDF("id", "name", "score")
    val ms = DeltaLite.selectiveMerge(spark, t, updates, Seq("id"))
    assert(ms.filesSkipped > 0, "mapped merge must still skip files")
    val fin = DeltaLite.read(spark, t)
    assert(fin.count() == 42L)
    assert(fin.filter(col("id") === 1L).select("name").as[String].head()
      == "N1")
  }

  test("purgeDvs (REORG APPLY PURGE): only DV-carrying files rewrite, " +
    "clean files stay byte-identical, vacuum then completes the erasure") {
    val t = newTable()
    DeltaLite.commit(spark, t,
      (0L until 80L).toDF("k").repartitionByRange(4, col("k")))
    DeltaLite.deleteVectors(spark, t, Seq(3L, 77L).toDF("k"), Seq("k"))
    val before = DeltaLite.snapshot(spark, t)
    val cleanSizes = before.files.filterNot(before.dvs.contains)
      .map(p => p -> java.nio.file.Files.size(java.nio.file.Paths.get(t, p)))
    val st = DeltaLite.purgeDvs(spark, t)
    assert(st.filesRewritten == before.dvs.size &&
      st.filesRewritten + st.filesUntouched == before.files.size)
    val after = DeltaLite.snapshot(spark, t)
    assert(after.dvs.isEmpty, "no DV survives a purge")
    cleanSizes.foreach { case (p, sz) =>
      assert(after.files.contains(p) &&
        java.nio.file.Files.size(java.nio.file.Paths.get(t, p)) == sz,
        s"clean file $p must survive byte-identical")
    }
    assert(DeltaLite.read(spark, t).count() == 78L)
    // idempotent: a second purge is a no-op commit-wise
    assert(DeltaLite.purgeDvs(spark, t).filesRewritten == 0)
    // purge + vacuum = compliance erasure: sidecars and pre-purge data gone
    val victims = DeltaLite.vacuum(spark, t, retainVersions = 1)
    assert(victims.exists(_.endsWith(".bin")))
    assert(DeltaLite.read(spark, t).count() == 78L)
    // and the conversion refusal is cleared
    val dst = newTable()
    graft.sources.FormatConvert.deltaToIceberg(spark, t, dst)
    assert(graft.sources.IcebergLite.read(spark, dst).count() == 78L)
  }

  test("streamingDvDelete: a CDC delete feed lands as per-batch DV " +
    "commits, and replaying the same keys changes NOTHING (value-level " +
    "idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = newTable()
    DeltaLite.commit(spark, t, (0L until 40L).toDF("k"))
    val mem = MemoryStream[Long]
    val q = graft.streaming.EventStreams.streamingDvDelete(
        mem.toDF().toDF("k"), t, Seq("k"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", t + "_ckpt")
    mem.addData(3L, 9L)
    q.start().awaitTermination()
    assert(DeltaLite.read(spark, t).count() == 38L)
    mem.addData(9L, 21L) // 9 is already dead — only 21 should land
    q.start().awaitTermination()
    assert(DeltaLite.read(spark, t).count() == 37L)
    val versionsAfter = DeltaLite.versions(spark, t)
    // replay the SAME keys (a new un-checkpointed feed — the harsher
    // replay than the engine's own): zero victims, zero new commits
    val mem2 = MemoryStream[Long]
    val q2 = graft.streaming.EventStreams.streamingDvDelete(
        mem2.toDF().toDF("k"), t, Seq("k"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", t + "_ckpt2")
    mem2.addData(3L, 9L, 21L)
    q2.start().awaitTermination()
    assert(DeltaLite.read(spark, t).count() == 37L)
    assert(DeltaLite.versions(spark, t) == versionsAfter,
      "a replayed delete batch must not commit")
  }

  test("column mapping + deletion vectors compose (the current-engine " +
    "default table shape)") {
    val t = newTable()
    DeltaLite.commit(spark, t,
      (0L until 25L).map(k => (k, s"d$k")).toDF("id", "payload"),
      columnMapping = true)
    val st = DeltaLite.deleteVectors(spark, t, Seq(2L, 3L).toDF("id"), Seq("id"))
    // the DV commit's protocol upgrade must KEEP advertising columnMapping
    // alongside deletionVectors — a features protocol action replaces the
    // previous one, and a conformant external reader of a mapped table
    // without the feature would read physical col-<id> names as logical
    val commitText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_delta_log", f"${st.version}%020d.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val protoLine = commitText.linesIterator
      .find(_.contains("\"protocol\"")).getOrElse(fail("no protocol action"))
    assert(protoLine.contains("deletionVectors") &&
      protoLine.contains("columnMapping"),
      s"mapped DV protocol must carry both features: $protoLine")
    val out = DeltaLite.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload"))
    assert(out.select("id").as[Long].collect().toSet
      == (0L until 25L).toSet -- Set(2L, 3L))
    // additive schema evolution on a mapped table: the new column gets a
    // fresh physical name, old rows read null
    DeltaLite.commit(spark, t,
      Seq((99L, "tail", 7L)).toDF("id", "payload", "extra"))
    val evolved = DeltaLite.read(spark, t)
    assert(evolved.schema.fieldNames.toSeq == Seq("id", "payload", "extra"))
    assert(evolved.filter(col("id") === 99L).select("extra").as[Long].head()
      == 7L)
    assert(evolved.filter(col("id") === 0L).select("extra").head().isNullAt(0))
  }
}
