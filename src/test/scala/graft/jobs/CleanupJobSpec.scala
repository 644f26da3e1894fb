package graft.jobs

import graft.SparkSpec
import graft.gen.SequenceGen
import graft.model.Sequence
import org.apache.spark.sql.functions._

/** E3 tail cleanup: promoted staging partitions are dropped only after the
  * store verifiably holds them; blocked staging stays; leftovers swept. */
class CleanupJobSpec extends SparkSpec {
  import spark.implicits._

  test("cleanup drops only verifiably-promoted staging partitions and " +
      "sweeps leftovers; dry-run touches nothing") {
    val dir = tmpDir("cleanup")
    SequenceGen.sequences(spark, 600)
      .write.mode("overwrite").partitionBy("source").parquet(s"$dir/input")
    val parts = graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get
    val promoted = parts.take(2)

    // store holds ONLY the first promoted source's full rows — the second
    // "promoted" source is missing from the store (failed move) and must
    // be kept in staging
    spark.read.parquet(s"$dir/input")
      .filter(col("source") === promoted.head)
      .write.mode("overwrite").partitionBy("source").parquet(s"$dir/store")

    // leftovers under the validation outDir: a _temporary dir, an orphaned
    // reclaim tombstone, and a STALE lock (mtime pushed past the window);
    // plus a LIVE lock scenario checked at the end
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/out/violations/_temporary"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/out/_running.reclaim.dead-uuid"), true).close()
    val lockPath = new org.apache.hadoop.fs.Path(s"$dir/out/_running")
    fs.create(lockPath, true).close()
    val past = System.currentTimeMillis() - CleanupJob.lockStaleMs - 60000L
    fs.setTimes(lockPath, past, past)

    val dry = CleanupJob.run(spark, s"$dir/input", s"$dir/store", promoted,
      Some(s"$dir/out"), dryRun = true)
    assert(dry.cleaned === Seq(promoted.head))
    assert(dry.kept === promoted.tail.sorted)
    assert(dry.leftoversRemoved.size === 3)
    // dry run: everything still present
    assert(graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get === parts)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/out/_running")))

    val r = CleanupJob.run(spark, s"$dir/input", s"$dir/store", promoted,
      Some(s"$dir/out"))
    assert(r.cleaned === Seq(promoted.head))
    val after = graft.sources.TableIO
      .partitionValues(spark, s"$dir/input", "source").get
    assert(after.toSet === parts.toSet - promoted.head)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/out/violations/_temporary")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/out/_running.reclaim.dead-uuid")))
    assert(!fs.exists(lockPath))

    // a LIVE (fresh) lock is NEVER swept — deleting it would re-admit a
    // concurrent double-writer mid-run
    fs.create(lockPath, true).close()
    val r2 = CleanupJob.run(spark, s"$dir/input", s"$dir/store", Nil,
      Some(s"$dir/out"))
    assert(r2.leftoversRemoved.isEmpty)
    assert(fs.exists(lockPath))
  }

  test("cleanup before any transfer keeps everything (no store)") {
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
