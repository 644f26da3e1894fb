package graft.jobs

import graft.SparkSpec
import graft.gen.SequenceGen
import graft.model.Sequence
import org.apache.spark.sql.functions._

/** E3 tail cleanup: staging partitions are dropped only when the store's
  * promotions log proves the current staging snapshot was promoted AND the
  * store holds the rows; blocked/stale staging stays; leftovers swept with
  * liveness guards. */
class CleanupJobSpec extends SparkSpec {
  import spark.implicits._

  private def writePromotion(storeDir: String, source: String,
      snapshotId: String): Unit =
    graft.sources.TableIO.writePartitioned(
      Seq(source).toDF("source")
        .withColumn("snapshot_id", lit(snapshotId))
        .withColumn("promoted_at", lit("2026-08-16T00:00:00Z")),
      TransferJob.promotionsPath(storeDir))

  test("cleanup drops only lineage-verified promoted partitions and " +
      "sweeps stale leftovers; dry-run touches nothing") {
    val dir = tmpDir("cleanup")
    SequenceGen.sequences(spark, 600)
      .write.mode("overwrite").partitionBy("source").parquet(s"$dir/input")
    val parts = graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get
    val promoted = parts.take(2)
    val snap = graft.sources.TableIO.snapshotId(spark, s"$dir/input")

    // store holds ONLY the first promoted source's full rows, and the
    // promotions log records it against the CURRENT staging snapshot; the
    // second "promoted" source is missing from the store (failed move)
    spark.read.parquet(s"$dir/input")
      .filter(col("source") === promoted.head)
      .write.mode("overwrite").partitionBy("source").parquet(s"$dir/store")
    writePromotion(s"$dir/store", promoted.head, snap)

    // leftovers under the validation outDir: a STALE _temporary dir, an
    // orphaned reclaim tombstone, and a STALE lock
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val past = System.currentTimeMillis() - CleanupJob.lockStaleMs - 60000L
    val tmpDirPath =
      new org.apache.hadoop.fs.Path(s"$dir/out/violations/_temporary")
    fs.mkdirs(tmpDirPath)
    fs.setTimes(tmpDirPath, past, past)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/out/_running.reclaim.dead-uuid"), true).close()
    val lockPath = new org.apache.hadoop.fs.Path(s"$dir/out/_running")
    fs.create(lockPath, true).close()
    fs.setTimes(lockPath, past, past)

    val dry = CleanupJob.run(spark, s"$dir/input", s"$dir/store", promoted,
      Some(s"$dir/out"), dryRun = true)
    assert(dry.cleaned === Seq(promoted.head))
    assert(dry.kept === promoted.tail.sorted)
    assert(dry.leftoversRemoved.size === 3)
    // dry run: everything still present
    assert(graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get === parts)
    assert(fs.exists(lockPath))

    val r = CleanupJob.run(spark, s"$dir/input", s"$dir/store", promoted,
      Some(s"$dir/out"))
    assert(r.cleaned === Seq(promoted.head))
    val after = graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get
    assert(after.toSet === parts.toSet - promoted.head)
    assert(!fs.exists(tmpDirPath))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/out/_running.reclaim.dead-uuid")))
    assert(!fs.exists(lockPath))

    // LIVE (fresh) lock and FRESH _temporary are NEVER swept — they may
    // belong to a running validation
    fs.create(lockPath, true).close()
    fs.mkdirs(tmpDirPath)
    val r2 = CleanupJob.run(spark, s"$dir/input", s"$dir/store", Nil,
      Some(s"$dir/out"))
    assert(r2.leftoversRemoved.isEmpty)
    assert(fs.exists(lockPath) && fs.exists(tmpDirPath))
  }

  test("a stale store generation never authorizes deleting corrected " +
      "staging, even when store rows >= staging rows") {
    val dir = tmpDir("cleanup-stale")
    // original 6-row generation was promoted (store holds it)...
    val orig = (1 to 6).map(i =>
      Sequence(f"D$i%012d", Array(1, 2), 2, "mito"))
    orig.toDS().write.mode("overwrite").partitionBy("source")
      .parquet(s"$dir/store")
    // ...then staging was corrected to a SMALLER 4-row generation
    orig.take(4).toDS().write.mode("overwrite").partitionBy("source")
      .parquet(s"$dir/input")
    // the promotions log records the OLD snapshot, not the current one
    writePromotion(s"$dir/store", "mito", "stale-snapshot-id")

    val r = CleanupJob.run(spark, s"$dir/input", s"$dir/store", Seq("mito"))
    assert(r.cleaned.isEmpty)
    assert(r.kept === Seq("mito"))
    assert(graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get === Seq("mito"))

    // re-promoting the corrected snapshot unblocks cleanup (store
    // rewritten first — a full overwrite wipes _promotions with it)
    orig.take(4).toDS().write.mode("overwrite").partitionBy("source")
      .parquet(s"$dir/store") // store now holds the corrected generation
    writePromotion(s"$dir/store",
      "mito", graft.sources.TableIO.snapshotId(spark, s"$dir/input"))
    val r2 = CleanupJob.run(spark, s"$dir/input", s"$dir/store", Seq("mito"))
    assert(r2.cleaned === Seq("mito"))
  }

  test("cleanup before any transfer keeps everything (no store, no log)") {
    val dir = tmpDir("cleanup2")
    SequenceGen.sequences(spark, 200)
      .write.mode("overwrite").partitionBy("source").parquet(s"$dir/input")
    val parts = graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get
    val r = CleanupJob.run(spark, s"$dir/input", s"$dir/nonexistent-store",
      parts)
    assert(r.cleaned.isEmpty)
    assert(r.kept === parts)
    assert(graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get === parts)
  }
}
