package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import graft.sources.{LedgerBatchWrite, LedgerSink, LedgerStaged, LedgerWriter}

/** The ledger sink's two-phase commit, mechanism by mechanism: what
  * makes a custom DSv2 writer exactly-once is that VISIBILITY equals
  * the acknowledged commit-message set — staged files from aborted or
  * retried tasks must be unreachable no matter what is on disk.
  */
class LedgerSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("ledger_spec").toString

  private def readBack(dir: String) =
    spark.read.format("graft.sources.LedgerSink").option("path", dir).load()

  test("write/read roundtrip is an exact identity, 16 bytes per record") {
    val dir = freshDir()
    val df = Seq((1L, 100L), (2L, -250L), (3L, Long.MaxValue)).toDF("key", "cents")
    df.write.format("graft.sources.LedgerSink")
      .option("path", dir).mode("append").save()
    val back = readBack(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back === Set((1L, 100L), (2L, -250L), (3L, Long.MaxValue)))
    val committed = LedgerSink.committedFiles(dir)
    assert(committed.nonEmpty)
    assert(committed.map(_.length()).sum === 3L * LedgerSink.RecordBytes,
      "fixed-width format must be exactly 16 bytes per record")
    // nothing is left behind in staging after commit
    assert(new File(LedgerSink.stagingDir(dir)).listFiles().isEmpty)
  }

  test("an aborted writer publishes nothing") {
    val dir = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(LedgerSink.stagingDir(dir)))
    val w = new LedgerWriter(dir, 0, 7L)
    w.write(InternalRow(9L, 900L))
    w.abort()
    assert(readBack(dir).count() === 0L)
    assert(new File(LedgerSink.stagingDir(dir)).listFiles().isEmpty,
      "abort must delete the staged file")
  }

  test("commit publishes exactly the acknowledged messages; orphan staged files never surface") {
    val dir = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(LedgerSink.stagingDir(dir)))
    // two writers stage; only one is acknowledged (the other plays a
    // zombie task attempt whose message was never delivered)
    val acked = new LedgerWriter(dir, 0, 1L)
    acked.write(InternalRow(1L, 10L))
    val msg = acked.commit()
    val zombie = new LedgerWriter(dir, 0, 2L)
    zombie.write(InternalRow(2L, 20L))
    zombie.commit() // staged and closed, but its message is LOST
    new LedgerBatchWrite(dir).commit(Array(msg))
    val back = readBack(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back === Set((1L, 10L)),
      "only the acknowledged writer's rows may be visible")
    // the zombie's file still exists in staging — present on disk,
    // invisible to the table, exactly the contract
    assert(new File(LedgerSink.stagingDir(dir)).listFiles()
      .count(_.getName.endsWith(".ledger")) === 1)
  }

  test("job-level abort removes all staged files") {
    val dir = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(LedgerSink.stagingDir(dir)))
    val w1 = new LedgerWriter(dir, 0, 1L)
    w1.write(InternalRow(1L, 10L))
    val m1 = w1.commit()
    val w2 = new LedgerWriter(dir, 1, 2L)
    w2.write(InternalRow(2L, 20L))
    val m2 = w2.commit()
    new LedgerBatchWrite(dir).abort(Array(m1, m2))
    assert(readBack(dir).count() === 0L)
    assert(new File(LedgerSink.stagingDir(dir)).listFiles().isEmpty)
  }

  test("the sink rejects a mis-shaped frame loudly") {
    val dir = freshDir()
    val bad = Seq(("a", 1L)).toDF("key", "cents")
    val e = intercept[Exception] {
      bad.write.format("graft.sources.LedgerSink")
        .option("path", dir).mode("append").save()
    }
    assert(e.getMessage != null)
  }
}
