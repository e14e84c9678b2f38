package graft

import graft.table.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The snapshot-log table format: atomic append, time travel, incremental
  * scan, optimistic-concurrency rebase, orphan expiry. All paths use a
  * `file:` URI so every byte of bookkeeping rides the Hadoop FileSystem
  * layer (the HDFS/S3A shape). */
class SnapshotTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshLoc(): String =
    "file:" + java.nio.file.Files.createTempDirectory("graft-table").toString

  private def df(ids: Int*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  test("append + read roundtrip; snapshots chain with increasing sequence numbers") {
    val loc = freshLoc()
    SnapshotTable.append(spark, loc, Map("rows" -> df(1, 2, 3)))
    SnapshotTable.append(spark, loc, Map("rows" -> df(4, 5)))
    val snaps = SnapshotTable.snapshots(spark, loc)
    assert(snaps.map(_.seq) == Vector(1L, 2L))
    assert(snaps(1).parentId == snaps(0).id)
    val got = SnapshotTable.read(spark, loc, "rows")
      .collect().map(_.getInt(0)).sorted.toVector
    assert(got == Vector(1, 2, 3, 4, 5))
  }

  test("time travel: asOf an earlier snapshot sees only its files") {
    val loc = freshLoc()
    val m1 = SnapshotTable.append(spark, loc, Map("rows" -> df(1, 2, 3)))
    SnapshotTable.append(spark, loc, Map("rows" -> df(4, 5)))
    val atFirst = SnapshotTable.read(spark, loc, "rows",
      asOf = Some(m1.currentSnapshotId))
      .collect().map(_.getInt(0)).sorted.toVector
    assert(atFirst == Vector(1, 2, 3))
  }

  test("incremental scan: readAdded returns exactly one snapshot's appended rows") {
    val loc = freshLoc()
    SnapshotTable.append(spark, loc, Map("rows" -> df(1, 2, 3)))
    val m2 = SnapshotTable.append(spark, loc, Map("rows" -> df(4, 5)))
    val added = SnapshotTable.readAdded(spark, loc, m2.currentSnapshotId, "rows")
      .collect().map(_.getInt(0)).sorted.toVector
    assert(added == Vector(4, 5))
  }

  test("multi-component append is one atomic snapshot") {
    val loc = freshLoc()
    import spark.implicits._
    SnapshotTable.append(spark, loc, Map(
      "a" -> df(1), "b" -> Seq("x", "y").toDF("s")))
    val snaps = SnapshotTable.snapshots(spark, loc)
    assert(snaps.size == 1)
    assert(SnapshotTable.read(spark, loc, "a").count() == 1)
    assert(SnapshotTable.read(spark, loc, "b").count() == 2)
    // both components share the single snapshot's manifest
    assert(SnapshotTable.addedFiles(spark, loc, snaps.head.id, "a").nonEmpty)
    assert(SnapshotTable.addedFiles(spark, loc, snaps.head.id, "b").nonEmpty)
  }

  test("manifest stats carry parquet-footer row counts and byte sizes") {
    val loc = freshLoc()
    val m = SnapshotTable.append(spark, loc,
      Map("rows" -> df(1 to 100: _*).coalesce(2)))
    val files = SnapshotTable.addedFiles(spark, loc, m.currentSnapshotId, "rows")
    assert(files.map(_.rows).sum == 100L)
    assert(files.forall(_.bytes > 0L))
  }

  test("commit conflict: loser detects the winner, rebases, and both snapshots survive") {
    val loc = freshLoc()
    SnapshotTable.append(spark, loc, Map("rows" -> df(1)))
    // the hook commits a competing snapshot between the loser's base-read
    // and install — a deterministic lost race
    SnapshotTable.append(spark, loc, Map("rows" -> df(3, 4)),
      summary = Map("who" -> "loser"),
      beforeInstall =
        () => SnapshotTable.append(spark, loc, Map("rows" -> df(2)),
          summary = Map("who" -> "winner")): Unit)
    val snaps = SnapshotTable.snapshots(spark, loc)
    assert(snaps.size == 3)
    // the rebased commit's parent is the winner, not the stale base
    val winner = snaps.find(_.summary.get("who").contains("winner")).get
    val loser = snaps.find(_.summary.get("who").contains("loser")).get
    assert(loser.parentId == winner.id)
    assert(loser.seq == winner.seq + 1)
    // no rows lost
    assert(SnapshotTable.read(spark, loc, "rows")
      .collect().map(_.getInt(0)).sorted.toVector == Vector(1, 2, 3, 4))
  }

  test("expireOrphans removes uncommitted data dirs, keeps committed ones") {
    val loc = freshLoc()
    SnapshotTable.append(spark, loc, Map("rows" -> df(1, 2)))
    // simulate a writer killed after its data write but before commit
    df(9).write.parquet(s"$loc/data/deadbeef-orphan")
    assert(SnapshotTable.expireOrphans(spark, loc) == 1)
    assert(SnapshotTable.read(spark, loc, "rows").count() == 2)
    assert(SnapshotTable.expireOrphans(spark, loc) == 0)
  }

  test("corrupt current metadata fails with a clear parse error, not a hang or garbage read") {
    val loc = freshLoc()
    SnapshotTable.append(spark, loc, Map("rows" -> df(1, 2)))
    // clobber v1 with truncated JSON (simulates a torn non-atomic write on
    // a filesystem without atomic rename — the documented caveat)
    val root = new org.apache.hadoop.fs.Path(loc)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "metadata/v1.metadata.json"), true)
    out.write("""{"format-version":1,"table-uu""".getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] { SnapshotTable.load(spark, loc) }
    assert(e.getMessage != null)
  }

  test("version-hint and metadata versions are discoverable; load of empty dir is None") {
    val loc = freshLoc()
    assert(SnapshotTable.load(spark, loc).isEmpty)
    SnapshotTable.append(spark, loc, Map("rows" -> df(1)))
    SnapshotTable.append(spark, loc, Map("rows" -> df(2)))
    val meta = SnapshotTable.load(spark, loc).get
    assert(meta.currentSnapshotId == meta.snapshots.last.id)
    assert(meta.lastSeq == 2L)
  }
}
