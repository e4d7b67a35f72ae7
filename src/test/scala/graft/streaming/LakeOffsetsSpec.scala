package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.{Housekeeping, SnapshotLake}

/** The exactly-once contract of txn-carrying lake commits and the
  * q102 offset-transactional streaming gate built on them.
  */
class LakeOffsetsSpec extends SparkTestBase {

  private def frame(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong * 7)).toDF("event_id", "cents")
  }

  test("txn commit is idempotent: a replayed (app, batch) publishes nothing") {
    val root = Housekeeping.tempDir("txn_idem")
    val v0 = SnapshotLake.commit(spark, root, frame(100), "event_id",
      txn = Some(("appA", 0L)))
    assert(v0 === 0)
    assert(SnapshotLake.lastTxn(root, "appA") === 0L)
    // replay of batch 0: no new version, no new rows
    val vReplay = SnapshotLake.commit(spark, root, frame(100), "event_id",
      txn = Some(("appA", 0L)))
    assert(vReplay === 0, "replayed commit must return the existing head")
    assert(SnapshotLake.headVersion(root) === 0)
    assert(SnapshotLake.read(spark, root).count() === 100)
    // a LOWER batch id than already recorded is also a replay
    SnapshotLake.commit(spark, root, frame(10), "event_id",
      txn = Some(("appA", 1L)))
    assert(SnapshotLake.lastTxn(root, "appA") === 1L)
    val vStale = SnapshotLake.commit(spark, root, frame(10), "event_id",
      txn = Some(("appA", 0L)))
    assert(vStale === SnapshotLake.headVersion(root))
    assert(SnapshotLake.read(spark, root).count() === 110)
  }

  test("txn identity is per-app: another writer's batch ids don't collide") {
    val root = Housekeeping.tempDir("txn_apps")
    SnapshotLake.commit(spark, root, frame(5), "event_id",
      txn = Some(("appA", 0L)))
    val v = SnapshotLake.commit(spark, root, frame(5), "event_id",
      txn = Some(("appB", 0L)))
    assert(v === 1, "appB's batch 0 is not appA's batch 0")
    assert(SnapshotLake.lastTxn(root, "appA") === 0L)
    assert(SnapshotLake.lastTxn(root, "appB") === 0L)
    assert(SnapshotLake.lastTxn(root, "appC") === -1L)
  }

  test("untxn'd commits coexist with txn'd ones in one chain") {
    val root = Housekeeping.tempDir("txn_mixed")
    SnapshotLake.commit(spark, root, frame(5), "event_id")
    SnapshotLake.commit(spark, root, frame(5), "event_id",
      txn = Some(("appA", 3L)))
    SnapshotLake.commit(spark, root, frame(5), "event_id")
    assert(SnapshotLake.lastTxn(root, "appA") === 3L)
    assert(SnapshotLake.headVersion(root) === 2)
  }

  test("lastTxn survives vacuumed manifests; retention bounds the dedup horizon") {
    val root = Housekeeping.tempDir("txn_vacuum")
    SnapshotLake.commit(spark, root, frame(5), "event_id",
      txn = Some(("appA", 0L)))
    SnapshotLake.commit(spark, root, frame(5), "event_id",
      txn = Some(("appA", 1L)))
    SnapshotLake.commit(spark, root, frame(5), "event_id")
    val (droppedManifests, _) = SnapshotLake.vacuum(root, keepVersions = 1)
    assert(droppedManifests === 2)
    // the chain walk must not throw on the vacuumed versions...
    val last = SnapshotLake.lastTxn(root, "appA")
    // ...and the txn records carried by the dropped manifests are
    // gone with them — the documented retention caveat
    assert(last === -1L)
    // a replayed batch 1 after retention loss therefore LANDS (the
    // horizon was vacuumed away): retention must cover the replay
    // window, which is the contract the scaladoc states
    val v = SnapshotLake.commit(spark, root, frame(5), "event_id",
      txn = Some(("appA", 1L)))
    assert(v === SnapshotLake.headVersion(root))
    assert(SnapshotLake.lastTxn(root, "appA") === 1L)
  }

  test("q102 gate: checkpoint loss + re-delivery still lands every event exactly once") {
    val dir = sf("sf0.001")
    val got = StreamingGate.q102StreamLakeOffsets(spark, dir)
    val want = graft.sources.Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("cents"))
      .orderBy(col("event_id"))
    assert(got.count() === want.count(), "row count drifted — dupes or loss")
    assert(got.collect().toSeq === want.collect().toSeq)
  }
}
