package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.ConcurrentModificationException

import scala.util.Try

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLite, IcebergLite}

/** Optimistic concurrency for both table formats — the r11 verdict's #6:
  * the documented single-writer contract now has a multi-writer commit
  * path (put-if-absent version claim + rebase-or-refuse conflict rules).
  * Covers the CAS primitive, latch-aligned racing appenders with zero
  * lost updates, and the read-modify-write conflict refusal (both via
  * CAS loss and via the stale-replace liveness check, so the test is
  * deterministic under every interleaving).
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("delta: the version claim is put-if-absent — the second writer " +
    "of a version loses and the winner's commit is untouched") {
    val t = newTable("graft_occ_delta")
    DeltaLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s"))
    // a winner takes v1
    DeltaLite.commit(spark, t, Seq((2L, "b")).toDF("k", "s"))
    // a late claim of v1 must FAIL, not overwrite
    val lost = DeltaLite.publishCommitIfAbsent(spark, t, 1L,
      """{"commitInfo":{"operation":"EVIL","timestamp":0}}""" + "\n")
    assert(!lost)
    assert(DeltaLite.history(spark, t).filter(col("operation") === "EVIL")
      .count() == 0L, "the losing claim must not replace the winner")
    assert(DeltaLite.read(spark, t).count() == 2L)
  }

  test("delta: latch-aligned contended appenders all land, no lost " +
    "update, linear version history") {
    val t = newTable("graft_occ_delta2")
    DeltaLite.commit(spark, t, Seq((0L, "seed")).toDF("k", "s"))
    val n = 4
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val results = (1 to n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          latch.await()
          DeltaLite.commitContended(spark, t,
            Seq((i.toLong, s"w$i")).toDF("k", "s"))
        }
      })
    }
    latch.countDown()
    val versions = results.map(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(versions.toSet.size == n, s"duplicate versions: $versions")
    assert(versions.toSet == (1L to n.toLong).toSet)
    assert(DeltaLite.read(spark, t).select("k").as[Long].collect().toSet
      == (0L to n.toLong).toSet, "an append was lost")
  }

  test("delta: a stale read-modify-write is refused, never silently " +
    "published (CAS loss or liveness check — every interleaving)") {
    val t = newTable("graft_occ_delta3")
    DeltaLite.commit(spark, t, (0L until 40L).toDF("k"))
    val staleFiles = DeltaLite.snapshot(spark, t).files
    // a winner rewrites the table (all files replaced)
    DeltaLite.commit(spark, t, (100L until 140L).toDF("k"),
      overwrite = true)
    // the stale merge (derived from the OLD snapshot) must refuse
    val e = intercept[ConcurrentModificationException] {
      DeltaLite.commitContended(spark, t, (0L until 40L).toDF("k"),
        operation = "MERGE", replacing = Some(staleFiles))
    }
    assert(e.getMessage.contains("re-run"))
    assert(DeltaLite.read(spark, t).select("k").as[Long].collect().toSet
      == (100L until 140L).toSet, "the stale merge must not publish")

    // two latch-aligned replacing-writers over the SAME base: exactly
    // one publishes, the other refuses — under every interleaving
    val base = DeltaLite.snapshot(spark, t).files
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val outcomes = (1 to 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Try[Long]] {
        def call(): Try[Long] = {
          latch.await()
          Try(DeltaLite.commitContended(spark, t,
            (1000L * i until 1000L * i + 5L).toDF("k"),
            operation = "MERGE", replacing = Some(base)))
        }
      })
    }
    latch.countDown()
    val done = outcomes.map(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(done.count(_.isSuccess) == 1,
      s"exactly one merge may win, got $done")
    assert(done.count(r => r.isFailure &&
      r.failed.get.isInstanceOf[ConcurrentModificationException]) == 1)
  }

  test("delta: a lost race against a metadata-changing winner REFUSES " +
    "the rebase instead of silently reverting the winner's schema") {
    val t = newTable("graft_occ_meta")
    DeltaLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s"))
    // the loser appends the OLD shape; the seam lands a winner that
    // evolves the schema additively between the loser's base read and
    // its publish attempt — the exact window a blind rebase would
    // re-emit the stale metaData in and hide the winner's column
    val e = intercept[ConcurrentModificationException] {
      DeltaLite.commitContended(spark, t, Seq((2L, "b")).toDF("k", "s"),
        raceSeam = () => DeltaLite.commit(spark, t,
          Seq((10L, "w", 5L)).toDF("k", "s", "extra")))
    }
    assert(e.getMessage.contains("metadata"))
    // the winner's evolution survives: column present, its data visible
    val out = DeltaLite.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("k", "s", "extra"))
    assert(out.filter(col("k") === 10L).select("extra").as[Long].head() == 5L)
    // the loser re-runs against the new tip (now carrying the evolved
    // shape) and lands
    DeltaLite.commitContended(spark, t,
      Seq((2L, "b", 0L)).toDF("k", "s", "extra"))
    assert(DeltaLite.read(spark, t).count() == 3L)
  }

  test("delta: an identical-metadata create race rebases cleanly — " +
    "no false metadata conflict") {
    val t = newTable("graft_occ_meta2")
    // both writers create the same-schema table; the winner takes v0
    // with metaData, the loser's metaData is byte-identical → rebase
    val v = DeltaLite.commitContended(spark, t, Seq((2L, "b")).toDF("k", "s"),
      raceSeam = () => DeltaLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s")))
    assert(v == 1L)
    assert(DeltaLite.read(spark, t).select("k").as[Long].collect().toSet
      == Set(1L, 2L), "both creates' rows land")
  }

  test("iceberg: contended appenders all land with distinct snapshots " +
    "and no lost update; stale replace refused") {
    val t = newTable("graft_occ_ice")
    IcebergLite.commit(spark, t, Seq((0L, "seed")).toDF("k", "s"))
    val n = 3
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val results = (1 to n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          latch.await()
          IcebergLite.commitContended(spark, t,
            Seq((i.toLong, s"w$i")).toDF("k", "s"))
        }
      })
    }
    latch.countDown()
    val ids = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(ids.toSet.size == n, s"duplicate snapshot ids: $ids")
    assert(IcebergLite.read(spark, t).select("k").as[Long].collect().toSet
      == (0L to n.toLong).toSet, "an append was lost")

    // stale replace: derived from a snapshot that an overwrite then
    // replaced — must refuse, not resurrect
    val stale = IcebergLite.snapshot(spark, t).files
    IcebergLite.commit(spark, t, Seq((99L, "ow")).toDF("k", "s"),
      overwrite = true)
    val e = intercept[ConcurrentModificationException] {
      IcebergLite.commitContended(spark, t, Seq((7L, "x")).toDF("k", "s"),
        operation = "merge", replacing = Some(stale))
    }
    assert(e.getMessage.contains("re-run"))
    assert(IcebergLite.read(spark, t).select("k").as[Long].collect().toSet
      == Set(99L))
  }
}
