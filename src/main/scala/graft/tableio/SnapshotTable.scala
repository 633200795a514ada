package graft.tableio

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-layout snapshot table: immutable Parquet data files + JSON
  * snapshot manifests + an atomically-swapped HEAD pointer. Gives the
  * north-rule properties — snapshots, per-partition lineage, idempotent
  * batch commits, resumability, time-travel reads — without an Iceberg
  * runtime jar (none is available offline; SURVEY.md §7). The layout is
  * deliberately Iceberg-shaped so a real catalog can replace it.
  *
  * Reference analog: the `.json`-beside-`.xml.gz` parse cache whose
  * presence = cache hit (csinsights/client/dblpclient.py:328-350), made
  * transactional.
  *
  * Layout:
  * {{{
  *   root/
  *     data/commit-<snapshotId>/part-*.parquet   (immutable)
  *     snapshots/snapshot-<id>.json              (manifest: files + lineage)
  *     HEAD                                      (current snapshot id; atomic rename)
  * }}}
  *
  * Driver-side manifest writes are tiny (one JSON per commit); data files
  * are written by executors via the normal Parquet sink, so commit cost is
  * O(1) in data size.
  */
object SnapshotTable {
  final case class Manifest(
      id: Long,
      parent: Long, // -1 for first
      batchId: Long, // user-level idempotency key; -1 if unkeyed
      files: Seq[String], // data files ADDED by this snapshot (relative)
      rows: Long, // rows added
      folded: Seq[Long] = Nil, // batch ids a REBASE preserved from the cut chain
      rebase: Boolean = false) // true iff written by compact() — parent == -1
        // alone does NOT identify a rebase (the first ordinary commit has
        // parent -1 too), which is what the compact idempotency guard needs

  /** Per-JVM memo of parsed manifests, keyed (table root, snapshot id) —
    * see [[SnapshotTable.manifest]] for the immutability argument. */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Manifest]()
}

final class SnapshotTable(val root: String) {
  import SnapshotTable.Manifest

  private val rootP = Paths.get(root)
  private val dataP = rootP.resolve("data")
  private val snapP = rootP.resolve("snapshots")
  private val headP = rootP.resolve("HEAD")

  Files.createDirectories(dataP)
  Files.createDirectories(snapP)

  // ------------------------------------------------------------- reads --

  def headId: Option[Long] =
    if (Files.exists(headP)) Some(new String(Files.readAllBytes(headP), StandardCharsets.UTF_8).trim.toLong)
    else None

  def manifest(id: Long): Manifest = {
    // Parses are memoized per JVM: without this, every chain walk
    // (committedBatchIds / readSinceBatch / read — several per
    // micro-batch) re-reads every manifest file on the chain, O(commits²)
    // file I/O over a long stream. A manifest file is rewritten in
    // exactly one case — commit() reusing an id orphaned by a HEAD
    // rollback (crash healing) — and commit() refreshes that entry, so
    // cached parses stay coherent for this single-writer table. Bounded:
    // cleared wholesale past a size cap; correctness never needs a hit.
    val key = (root, id)
    val cached = SnapshotTable.manifestCache.get(key)
    if (cached != null) cached
    else {
      val m = parseManifest(
        new String(Files.readAllBytes(snapP.resolve(s"snapshot-$id.json")), StandardCharsets.UTF_8))
      if (SnapshotTable.manifestCache.size > 65536) SnapshotTable.manifestCache.clear()
      SnapshotTable.manifestCache.put(key, m)
      m
    }
  }

  /** All manifests from `id` back to the root, newest first. */
  def chain(id: Long): Seq[Manifest] = {
    val out = scala.collection.mutable.ArrayBuffer[Manifest]()
    var cur = id
    while (cur >= 0) { val m = manifest(cur); out += m; cur = m.parent }
    out.toSeq
  }

  /** Live data files as of snapshot `id` (or HEAD). */
  def liveFiles(asOf: Option[Long] = None): Seq[String] =
    asOf.orElse(headId).map(id => chain(id).reverse.flatMap(_.files)).getOrElse(Nil)

  /** Time-travel read: the table as of a snapshot. Empty-schema-safe:
    * returns None when the table has no snapshots yet. */
  def read(spark: SparkSession, asOf: Option[Long] = None): Option[DataFrame] = {
    val files = liveFiles(asOf).map(f => rootP.resolve(f).toString)
    if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
  }

  /** Lineage-pruned read: only the data files of commits with
    * `batchId > afterBatch`. This is what a maintained-filter heal
    * ([[graft.seen.ShardStore]]) actually needs — the delta since the
    * filter's last good version — read in O(delta commits) instead of a
    * full-table scan (each commit's files are recorded in its manifest,
    * so pruning is a manifest walk, no file listing). */
  def readSinceBatch(spark: SparkSession, afterBatch: Long): Option[DataFrame] = {
    val files = headId.map(id => chain(id).filter(_.batchId > afterBatch)
      .flatMap(_.files)).getOrElse(Nil).map(f => rootP.resolve(f).toString)
    if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
  }

  /** Has a commit with this batchId already landed? (resume idempotency)
    * Includes the batch ids a compaction PRESERVED from the chain it cut
    * (`Manifest.folded`) — without them, a replayed pre-compaction commit
    * would land on the rebased chain and resurrect superseded rows. */
  def committedBatchIds: Set[Long] =
    headId.map(id => chain(id).flatMap(m => m.batchId +: m.folded)
      .filter(_ >= 0).toSet).getOrElse(Set.empty)

  /** True if any commit on the HEAD chain is UNKEYED (batchId = -1).
    * Unkeyed rows are invisible to [[readSinceBatch]]'s lineage pruning
    * (their batchId compares below every `afterBatch`), so a maintained
    * seen-filter healed from this chain would silently miss them — callers
    * on the maintained path must check this and fall back to the exact
    * gate (see [[graft.streaming.Streaming.runCrawlStream]]). */
  def hasUnkeyedCommits: Boolean =
    headId.exists(id => chain(id).exists(_.batchId < 0))

  // ------------------------------------------------------------ writes --

  /** Append `df` as a new snapshot. Skips (returning the existing head) if
    * `batchId` already committed — restart-safe. The committed row count
    * is captured with `observe` on the same write action (no extra job)
    * and recorded in the manifest — the north rule's per-commit lineage
    * metrics. */
  def commit(df: DataFrame, batchId: Long = -1L): Long =
    writeSnapshot(df, batchId, parentOf = _.getOrElse(-1L))

  /** Compact the table: write `df` (the caller's materialized current
    * state — e.g. the merge-on-read latest-version rows with tombstones
    * dropped) as ONE new snapshot whose parent is −1, i.e. a REBASE that
    * cuts the chain. Iceberg's `rewrite_data_files` analog: a k-commit
    * chain costs a reader k file sets per scan; after compaction, one.
    * Old snapshots stay readable by explicit time travel (`read(asOf)`
    * walks their own manifest chain) until [[expireSnapshots]] reclaims
    * them as an orphaned branch — exactly Iceberg's rewrite-then-expire
    * contract. `batchId` is the compaction's OWN idempotency key — pass a
    * FRESH id (a folded id would make the call a silent no-op via the
    * idempotency check). The cut chain's batch ids are preserved in the
    * rebase manifest (`Manifest.folded`) so replayed pre-compaction
    * commits stay no-ops and cannot resurrect superseded rows, and
    * [[readSinceBatch]] stays conservative: a heal asking for deltas past
    * an already-compacted batch sees nothing extra; one asking from
    * before the horizon reads the (complete) rebased state instead of a
    * no-longer-reachable delta. */
  def compact(df: DataFrame, batchId: Long): Long = synchronized {
    // idempotent replay is allowed only against a manifest compact() itself
    // wrote (m.rebase) — `parent == -1` alone also matches the table's
    // FIRST ordinary commit, so the pre-fix guard let
    // compact(df, batchId = <first commit's batchId>) silently no-op, the
    // exact caller bug it exists to catch
    require(batchId < 0 || !committedBatchIds.contains(batchId) ||
      headId.exists(id => chain(id).exists(m => m.rebase && m.batchId == batchId)),
      s"compact batchId $batchId is a batch already ON the chain — pass a fresh id " +
        "(the folded ids are preserved automatically)")
    writeSnapshot(df, batchId, parentOf = _ => -1L,
      folded = committedBatchIds.toSeq.sorted, rebase = true)
  }

  private def writeSnapshot(df: DataFrame, batchId: Long,
      parentOf: Option[Long] => Long, folded: Seq[Long] = Nil,
      rebase: Boolean = false): Long = synchronized {
    val head = headId
    if (batchId >= 0 && committedBatchIds.contains(batchId)) return head.get
    val id = head.map(_ + 1).getOrElse(0L)
    val commitDir = dataP.resolve(s"commit-$id")
    // Crash recovery: a leftover commit-<id> dir for id > HEAD is always
    // an ABORTED commit's debris (data written, HEAD never swapped — the
    // snapshot isn't referenced by any manifest on the chain). Without
    // this sweep a restart would fail PATH_ALREADY_EXISTS forever
    // (found by ResumeSpec's crash-between-commits fault injection).
    if (Files.exists(commitDir)) deleteRecursively(commitDir)
    val obs = org.apache.spark.sql.Observation(s"commit-$id")
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("errorifexists").parquet(commitDir.toString)
    val rows = obs.get.get("rows").map(_.asInstanceOf[Long]).getOrElse(-1L)
    val files = Files.list(commitDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => rootP.relativize(p).toString).toSeq.sorted
    val m = Manifest(id, parentOf(head), batchId, files, rows, folded, rebase)
    writeAtomic(snapP.resolve(s"snapshot-$id.json"), renderManifest(m))
    // keep the parse memo coherent: a HEAD rollback (crash healing) makes
    // the next commit REUSE the orphaned id with a fresh file list — the
    // one case where a manifest file is rewritten. Same-JVM rewrites all
    // pass through here, so overwriting the entry restores immutability
    // from the cache's point of view (a new JVM starts cold anyway).
    SnapshotTable.manifestCache.put((root, id), m)
    writeAtomic(headP, id.toString)
    id
  }

  /** GC orphaned branch snapshots (K4 cache-GC analog): delete manifests
    * not on the HEAD chain and any data files only they reference. The
    * table is append-only, so every file on the HEAD chain stays live
    * forever — there is no "last N snapshots" retention to apply. */
  def expireSnapshots(): Unit = synchronized {
    headId.foreach { h =>
      val all = chain(h)
      val live = all.flatMap(_.files).toSet // chain is cumulative; all files live
      val keepIds = all.map(_.id).toSet
      // snapshots not in the head chain (orphaned branches) → their files die
      Files.list(snapP).iterator().asScala.toList.foreach { p =>
        val name = p.getFileName.toString
        val id = name.stripPrefix("snapshot-").stripSuffix(".json").toLong
        if (!keepIds.contains(id)) {
          val m = manifest(id)
          m.files.filterNot(live.contains).foreach(f => Files.deleteIfExists(rootP.resolve(f)))
          Files.deleteIfExists(p)
        }
      }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteRecursively)
    Files.deleteIfExists(p)
    ()
  }

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // Minimal hand-rolled JSON (manifest fields are numbers + sanitized
  // relative paths we generate ourselves).
  private def renderManifest(m: Manifest): String = {
    val fs = m.files.map(f => "\"" + f.replace("\\", "/") + "\"").mkString("[", ",", "]")
    val fb = m.folded.mkString("[", ",", "]")
    s"""{"id":${m.id},"parent":${m.parent},"batchId":${m.batchId},"rows":${m.rows},"files":$fs,"folded":$fb,"rebase":${m.rebase}}"""
  }

  private def parseManifest(s: String): Manifest = {
    def longField(k: String): Long =
      ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s).get.group(1).toLong
    val files = "\"files\":\\[(.*?)\\]".r.findFirstMatchIn(s).get.group(1)
    val fs = if (files.isEmpty) Nil
      else files.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    // "folded" absent in pre-compaction-era manifests → empty
    val folded = "\"folded\":\\[(.*?)\\]".r.findFirstMatchIn(s)
      .map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toLong)).getOrElse(Nil)
    // "rebase" absent in pre-fix manifests → false (same back-compat rule
    // as "folded")
    val rebase = "\"rebase\":(true|false)".r.findFirstMatchIn(s)
      .exists(_.group(1) == "true")
    Manifest(longField("id"), longField("parent"), longField("batchId"), fs,
      longField("rows"), folded, rebase)
  }
}
