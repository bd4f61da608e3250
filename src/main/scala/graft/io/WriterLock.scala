package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Best-effort single-writer guard for the persisted index lifecycles
  * ([[graft.llm.Retrieval]] BM25, [[graft.llm.Similarity]] IVF+PQ): their
  * append/compact paths mutate the index through temp-dir + rename swaps,
  * and while a CRASHED writer's state is mechanically recoverable (the
  * heal paths), two LIVE writers interleaving their swaps can silently
  * lose one batch's merge — e.g. both appends read the same df, each
  * writes a merged tmp, and the second swap overwrites the first's
  * contribution. The guard makes the second writer fail fast instead.
  *
  * Mechanics: an exclusive-create lock FILE placed as a SIBLING of the
  * index directory (`<dir>._graft_writer.lock` — a sibling because the
  * IVF compaction renames the index directory itself aside mid-swap, so
  * anything inside it would vanish with the swap and reopen the race
  * window). `fs.create(lock, overwrite = false)` fails when the file
  * exists — atomic on HDFS, best-effort on local/object stores, which
  * matches the guard's contract: it protects against accidental
  * concurrency, not byzantine writers. A crashed writer leaves its lock
  * behind; locks older than `staleAfterMs` are broken ONCE and
  * re-acquired (age from filesystem mtime), so a dead writer never wedges
  * the index permanently — the failure message names the file and the
  * self-break horizon for operators who need it sooner. */
object WriterLock {

  /** Named failure for a second live writer — catch-and-retry-able. */
  final class ConcurrentWriterException(msg: String)
      extends IllegalStateException(msg)

  private[graft] def lockPath(dir: String): Path = {
    val p = new Path(dir)
    val parent = Option(p.getParent).getOrElse(
      throw new IllegalArgumentException(s"cannot place a writer lock next to '$dir'"))
    new Path(parent, p.getName + "._graft_writer.lock")
  }

  /** Run `body` holding the exclusive writer lock for `dir`; always
    * releases. Throws [[ConcurrentWriterException]] when a live (younger
    * than `staleAfterMs`) writer holds it. */
  def withLock[T](spark: SparkSession, dir: String, op: String,
      staleAfterMs: Long = 30L * 60L * 1000L)(body: => T): T = {
    val lock = lockPath(dir)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lock, false)
        try out.write(
          (s"""{"op": "$op", "pid": ${ProcessHandle.current().pid()}, """ +
            s""""acquired_ms": ${System.currentTimeMillis()}}""").getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false } // exists = busy
    var acquired = tryAcquire()
    if (!acquired) {
      val status =
        try Some(fs.getFileStatus(lock))
        catch { case _: java.io.FileNotFoundException => None }
      val ageMs = status.map(s => System.currentTimeMillis() - s.getModificationTime)
      // Gone between attempts, or older than the horizon: break once.
      if (ageMs.forall(_ > staleAfterMs)) {
        try fs.delete(lock, false) catch { case _: java.io.IOException => () }
        acquired = tryAcquire()
      }
      if (!acquired) throw new ConcurrentWriterException(
        s"$op: another writer holds $lock" +
          ageMs.map(a => s" (acquired ~${a / 1000}s ago)").getOrElse("") +
          " — concurrent writers interleaving the index's rename swaps can " +
          "silently lose a batch. Retry after it finishes; if that writer is " +
          s"dead, delete the lock file (locks self-break after ${staleAfterMs} ms)")
    }
    try body finally {
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () } // release is best-effort
    }
  }

  /** Opportunistic form for maintenance a READER performs (the BM25 heal
    * on load): runs `body` only when the lock is free — a held lock means
    * a live writer owns the transitional on-disk state, and healing it
    * mid-swap would race the writer's own renames. Never throws busy. */
  def ifAcquired(spark: SparkSession, dir: String, op: String,
      staleAfterMs: Long = 30L * 60L * 1000L)(body: => Unit): Unit =
    try withLock(spark, dir, op, staleAfterMs)(body)
    catch { case _: ConcurrentWriterException => () }
}
