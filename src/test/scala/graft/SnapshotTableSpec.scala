package graft

import java.nio.file.Files

import graft.tableio.SnapshotTable

class SnapshotTableSpec extends SparkSpec {

  private def tmpTable(): SnapshotTable =
    new SnapshotTable(Files.createTempDirectory("snaptest").toString)

  test("commit/read round trip and cumulative snapshots") {
    import spark.implicits._
    val t = tmpTable()
    assert(t.read(spark).isEmpty)
    t.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), batchId = 0)
    t.commit(Seq((3, "c")).toDF("id", "v"), batchId = 1)
    val got = t.read(spark).get.as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("batchId commits are idempotent (restart replays are no-ops)") {
    import spark.implicits._
    val t = tmpTable()
    t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 7)
    val headBefore = t.headId
    t.commit(Seq((99, "dup")).toDF("id", "v"), batchId = 7) // replay
    assert(t.headId == headBefore)
    assert(t.read(spark).get.count() == 1)
    assert(t.committedBatchIds == Set(7L))
  }

  test("manifest parse memo stays coherent across HEAD rollback + id-reuse recommit") {
    import spark.implicits._
    // the crash-healing flow: roll HEAD back one commit, replay — the next
    // commit REUSES the orphaned snapshot id with a fresh file list. A
    // stale cached parse of the old manifest would resolve deleted data
    // files (found by ResumeSpec's fault injection when the memo landed).
    val t = tmpTable()
    t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 0)
    t.commit(Seq((2, "b")).toDF("id", "v"), batchId = 1)
    val head = t.headId.get
    t.chain(head) // warm the memo with the soon-to-be-orphaned manifest
    Files.write(java.nio.file.Paths.get(s"${t.root}/HEAD"),
      t.manifest(head).parent.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    t.commit(Seq((3, "c")).toDF("id", "v"), batchId = 2) // reuses id `head`
    val got = t.read(spark).get.as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "a"), (3, "c")))
    assert(t.committedBatchIds == Set(0L, 2L))
  }

  test("hasUnkeyedCommits flags batchId=-1 commits (maintained-filter guard)") {
    import spark.implicits._
    val t = tmpTable()
    assert(!t.hasUnkeyedCommits, "empty table must not flag")
    t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 0)
    assert(!t.hasUnkeyedCommits, "fully keyed chain must not flag")
    t.commit(Seq((2, "b")).toDF("id", "v")) // unkeyed
    assert(t.hasUnkeyedCommits,
      "unkeyed commit is invisible to readSinceBatch — must be flagged")
    // committedBatchIds stays empty-safe alongside it (the .max guard)
    val t2 = tmpTable()
    t2.commit(Seq((1, "a")).toDF("id", "v")) // ONLY unkeyed commits
    assert(t2.committedBatchIds.isEmpty && t2.hasUnkeyedCommits)
  }

  test("time-travel read sees the table as of an older snapshot") {
    import spark.implicits._
    val t = tmpTable()
    val s0 = t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 0)
    t.commit(Seq((2, "b")).toDF("id", "v"), batchId = 1)
    assert(t.read(spark, asOf = Some(s0)).get.count() == 1)
    assert(t.read(spark).get.count() == 2)
  }

  test("expireSnapshots removes orphaned branches, keeps the live chain (K4 GC)") {
    import spark.implicits._
    val t = tmpTable()
    t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 0)
    t.commit(Seq((2, "b")).toDF("id", "v"), batchId = 1)
    val before = t.read(spark).get.count()
    t.expireSnapshots()
    assert(t.read(spark).get.count() == before, "live data must survive GC")
    assert(t.chain(t.headId.get).size == 2)
  }

  test("manifest chain records lineage (id, parent, batchId)") {
    import spark.implicits._
    val t = tmpTable()
    t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 10)
    t.commit(Seq((2, "b")).toDF("id", "v"), batchId = 11)
    val chain = t.chain(t.headId.get)
    assert(chain.map(_.batchId) == Seq(11L, 10L))
    assert(chain.map(_.parent) == Seq(0L, -1L))
    assert(chain.forall(_.files.nonEmpty))
  }

  test("readSinceBatch prunes by lineage: only commits newer than the cutoff are read") {
    import spark.implicits._
    val t = tmpTable()
    t.commit(Seq((1, "a")).toDF("id", "v"), batchId = 0)
    t.commit(Seq((2, "b")).toDF("id", "v"), batchId = 1)
    t.commit(Seq((3, "c")).toDF("id", "v"), batchId = 2)
    assert(t.readSinceBatch(spark, 0).get.select("id")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(t.readSinceBatch(spark, -1).get.count() == 3)
    assert(t.readSinceBatch(spark, 2).isEmpty, "current store needs no delta")
  }

  test("compact rebases the chain to one snapshot; time travel + expire follow Iceberg") {
    import spark.implicits._
    val t = tmpTable()
    t.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), batchId = 0)
    t.commit(Seq((2, "b2"), (3, "c")).toDF("id", "v"), batchId = 1) // v2 of 2, new 3
    val preHead = t.headId.get
    // caller materializes the current state (here: latest v per id)
    val state = t.read(spark).get.groupBy("id")
      .agg(org.apache.spark.sql.functions.expr("max_by(v, v)").as("v"))
    val cid = t.compact(state, batchId = 1L + 1)
    // ONE snapshot chain, ONE file set — the read-amplification point
    assert(t.chain(t.headId.get).map(_.id) == Seq(cid))
    assert(t.liveFiles() == t.manifest(cid).files)
    assert(t.read(spark).get.as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b2"), (3, "c")))
    // pre-compaction snapshots stay time-travel-readable until expire
    assert(t.read(spark, Some(preHead)).get.count() == 4) // raw chain rows
    // readSinceBatch conservative: before the horizon → full rebased state;
    // at/after the horizon → nothing
    assert(t.readSinceBatch(spark, 0).get.count() == 3)
    assert(t.readSinceBatch(spark, 2).isEmpty)
    // compaction is batchId-idempotent like any commit
    assert(t.compact(state, batchId = 2L) == cid)
    // the cut chain's batch ids are PRESERVED in the rebase manifest, so a
    // replayed pre-compaction commit is still a no-op — without this, a
    // restart (or a bench/verify harness evaluating the query again) would
    // land batch 0/1 on the rebased chain and resurrect superseded rows
    assert(t.committedBatchIds == Set(0L, 1L, 2L))
    assert(t.commit(Seq((2, "b")).toDF("id", "v"), batchId = 0) == cid)
    assert(t.commit(Seq((9, "z")).toDF("id", "v"), batchId = 1) == cid)
    assert(t.read(spark).get.count() == 3, "replayed folded batches must not land")
    // a compaction keyed by an already-folded NON-rebase id is a caller
    // bug (it would silently no-op) — fail fast instead
    assert(intercept[IllegalArgumentException](
      t.compact(state, batchId = 0L)).getMessage.contains("fresh id"))
    // expire reclaims the orphaned pre-compaction branch and its files
    t.expireSnapshots()
    assert(scala.util.Try(t.read(spark, Some(preHead)).map(_.count())).isFailure,
      "expired snapshot must no longer resolve")
    assert(t.read(spark).get.count() == 3, "live chain untouched by expire")
  }
}
