package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Compaction for the persisted incremental indexes ([[Dedup]]'s MinHash
  * band index, [[Sim]]'s IVF cell index). Each ingest lands as its own
  * `increment=<n>` partition — correct and idempotent, but after many
  * deltas the index is a pile of small increment files and every probe
  * scan opens all of them. Compaction folds the increments back into the
  * build partition (`increment=0`) with the layout the build pass writes,
  * leaving probe results bit-identical while collapsing the file count —
  * the maintenance task a real index runs off the ingest path.
  *
  * At cluster scale the rewrite is one distributed read→write of the
  * index (no shuffle beyond the layout's own clustering repartition) and
  * the cutover is two directory renames — probes racing the swap see
  * either the old or the new layout, never a half-written mix.
  */
object IndexMaintenance {

  /** A second writer tried to mutate an index while another held its
    * lease — the single-writer ownership contract (SURVEY §8) violated
    * MECHANICALLY instead of silently: before round 12 two racing ingest
    * streams appending the same index would interleave increments
    * undetected until [[TermIndex.auditTermIndex]] /
    * [[Sim.auditIvfIndex]] noticed the damage after the fact. */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** The lease lives as a SIBLING of the index dir, never inside it:
    * a static-overwrite build wipes the dir's contents and the
    * [[rewrite]] swap renames the dir itself — a sentinel inside would
    * be destroyed by the very writes it guards. */
  private[graft] def leasePath(dir: String): Path =
    new Path(dir.stripSuffix("/") + ".__writer")

  /** Acquire the single-writer lease on `indexDir`, run `body`, release.
    * Acquisition is an atomic exclusive create — `Files.createFile` on a
    * local filesystem (check-and-create in one syscall), the namenode's
    * atomic `create(overwrite=false)` elsewhere — so two racing writers
    * can never both win. The loser gets a [[ConcurrentWriterException]]
    * naming the current holder. A crashed holder leaves its lease behind
    * BY DESIGN (the stale file names the dead owner for the operator);
    * [[breakWriterLease]] is the explicit recovery step. */
  private[graft] def withWriterLease[T](spark: SparkSession,
      indexDir: String, owner: String)(body: => T): T = {
    val lease = leasePath(indexDir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = lease.getFileSystem(conf)
    val stamp =
      s"$owner pid=${ProcessHandle.current().pid()} " +
        s"thread=${Thread.currentThread().getName} " +
        s"epoch_ms=${System.currentTimeMillis()}"
    Option(lease.getParent).foreach(fs.mkdirs(_))
    val uri = lease.toUri
    val acquired =
      if (uri.getScheme == null || uri.getScheme == "file") {
        // local FS: Hadoop's create(overwrite=false) is check-then-act;
        // NIO createFile is the atomic O_EXCL form
        try {
          val p = java.nio.file.Paths.get(uri.getPath)
          java.nio.file.Files.createFile(p)
          java.nio.file.Files.write(p, stamp.getBytes("UTF-8"))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        try {
          val out = fs.create(lease, false)
          try out.write(stamp.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }
    if (!acquired) {
      val holder =
        try {
          val in = fs.open(lease)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.take(200)
          finally in.close()
        } catch { case _: Throwable => "<unreadable>" }
      throw new ConcurrentWriterException(
        s"index $indexDir is held by another writer [$holder]; " +
          s"this write ($stamp) aborted cleanly. Single-writer contract: " +
          "one ingest owns an index. If the holder is dead, recover with " +
          "IndexMaintenance.breakWriterLease.")
    }
    try body finally fs.delete(lease, false)
  }

  /** Operator-facing recovery: drop a stale lease left by a crashed
    * writer (verify the owner named in the lease is dead FIRST — this is
    * the manual override of the ownership contract, not part of any
    * automatic path). Returns whether a lease existed. */
  def breakWriterLease(spark: SparkSession, indexDir: String): Boolean = {
    val lease = leasePath(indexDir)
    lease.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(lease, false)
  }

  /** Whether a writer currently holds `indexDir` (specs; monitoring). */
  def writerLeaseHeld(spark: SparkSession, indexDir: String): Boolean = {
    val lease = leasePath(indexDir)
    lease.getFileSystem(spark.sessionState.newHadoopConf()).exists(lease)
  }

  /** Rewrite `dir` through a staging sibling and swap it in: `write` lays
    * the new copy at `<dir>.compacting`, the old dataset moves aside,
    * staging renames into place, the old copy is dropped. On a failed
    * swap the original is restored — the index is never left missing.
    * Holds the writer lease on `dir` for the duration: a compaction
    * racing an ingest append on the same index is a contract violation
    * and fails cleanly instead of folding a half-landed increment. */
  private[graft] def rewrite(spark: SparkSession, dir: String)(
      write: String => Unit): Unit = withWriterLease(spark, dir, "rewrite") {
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(dir + ".compacting")
    val backup = new Path(dir + ".old")
    fs.delete(staging, true)
    fs.delete(backup, true)
    write(staging.toString)
    if (!fs.rename(target, backup))
      throw new IllegalStateException(s"compaction: cannot move aside $dir")
    if (!fs.rename(staging, target)) {
      fs.rename(backup, target)
      throw new IllegalStateException(s"compaction: cannot swap in $dir")
    }
    fs.delete(backup, true)
    ()
  }

  /** Number of `increment=<n>` partitions currently in the index — what a
    * compaction trigger policy keys on ([[graft.streaming.DedupStream]]:
    * compact once the delta pile exceeds a threshold). One directory
    * listing, no data read. */
  def incrementCount(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count(s => s.isDirectory &&
      s.getPath.getName.startsWith("increment=")).toLong
  }

  /** Invocation-unique scratch root for a demo index lifecycle (the
    * q128/q129/q139/q149 queries build a throwaway index per run). A
    * fixed path keyed on the input dir let two CONCURRENT invocations
    * over the same data race build/append/probe — the static build
    * wipes increments mid-probe (ConcurrencySpec now runs the lifecycle
    * queries in its parallel mix to pin the absence of that race). The
    * dir is registered for delete-on-exit so repeated bench runs don't
    * accumulate scratch indexes past the JVM's lifetime. */
  private[graft] def scratchIndexDir(spark: SparkSession,
      kind: String): String = {
    val p = new Path(s"${sys.props("java.io.tmpdir")}/graft-$kind-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12))
    p.getFileSystem(spark.sessionState.newHadoopConf()).deleteOnExit(p)
    p.toString
  }

  /** Snapshot-copy a persisted index/label store to a fresh path —
    * how a DECREMENTAL demonstration obtains its own mutable copy of a
    * maintained store without re-deriving it (the maintained original
    * stays read-only for its concurrent consumers). At cluster scale
    * this is a distributed file copy (distcp-shaped: no shuffle, no
    * recompute — cost is the store's size, not the corpus's); locally
    * one recursive filesystem copy. */
  private[graft] def cloneDir(spark: SparkSession, src: String,
      dst: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val srcP = new Path(src)
    val fs = srcP.getFileSystem(conf)
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, srcP,
        dst match { case d => new Path(d).getFileSystem(conf) },
        new Path(dst), false, conf))
      throw new IllegalStateException(s"snapshot copy $src -> $dst failed")
  }

  /** Largest `increment=<n>` partition id under `dir` (0 if none) — the
    * partition a streaming ingest may still replay after a crash, which
    * maintenance must therefore never fold ([[Sim.maintainIvfIndex]]).
    * One directory listing, no data read. */
  def maxIncrement(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("increment="))
      .map(_.getPath.getName.stripPrefix("increment=").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Parquet data-file count under `dir` — the quantity compaction exists
    * to shrink (specs assert it drops). */
  def parquetFileCount(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
