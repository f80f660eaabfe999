package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.atomic.AtomicBoolean

/** S1 proper — single-file tail shim: the reference tails ONE
  * log-rotated file (`access_log.clj:101-125`, commons-io `Tailer`
  * with 1 s polling and rotation detection), while Spark's file
  * stream source watches a DIRECTORY of immutable files. This adapter
  * closes that gap: it tails the literal file and spools every batch
  * of COMPLETE lines as a new immutable file into a directory that
  * [[StreamingFlagship.readLines]] consumes — rotation on the tailed
  * file ≙ new files in the spool, exactly the mapping SURVEY §2.1
  * sanctions, now with a real code path from an appended file.
  *
  * Tailer semantics mirrored:
  *  - poll-based (`pollMillis`), `fromEnd` to skip existing content
  *    like the reference's `Tailer/create … true`;
  *  - rotation = the file shrinks (truncate rotation) OR its identity
  *    changes (fileKey/inode — replace rotation, detected even when
  *    the new file already grew past the old offset within one poll):
  *    restart from offset 0, nothing lost, nothing duplicated;
  *  - a missing file is quietly awaited (`fileNotFound` analog);
  *  - only COMPLETE lines are ever emitted — a partially-written
  *    trailing line stays pending until its newline arrives;
  *  - spool files appear ATOMICALLY (write to a dot-temp, then
  *    rename) so the directory source can never read a half-file.
  *
  * Scale note: this is an edge adapter, one thread per tailed file at
  * the ingestion edge (the reference runs exactly one); everything
  * downstream is the ordinary distributed stream.
  */
final class FileTailer private (file: Path, spoolDir: Path,
    pollMillis: Long, fromEnd: Boolean) {

  private val running = new AtomicBoolean(true)
  private var offset = 0L
  private var pending = new java.io.ByteArrayOutputStream()
  private var seq = 0L
  private var identity: AnyRef = null

  // File identity signal for rotation: the length heuristic alone
  // misses a replace-rotation where the NEW file grows past the old
  // offset within one poll interval (commons-io Tailer has the same
  // race). fileKey() (inode on POSIX) changes on recreate; fall back
  // to creationTime where the filesystem reports no key.
  private def fileKey(): AnyRef = {
    val attrs = Files.readAttributes(file,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val k = attrs.fileKey()
    if (k != null) k else attrs.creationTime()
  }

  private def emit(completeLines: Array[Byte]): Unit = {
    val tmp = spoolDir.resolve(f".part-$seq%06d.tmp")
    val dst = spoolDir.resolve(f"part-$seq%06d.txt")
    Files.write(tmp, completeLines, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE): Unit
    seq += 1
  }

  private def poll(): Unit = {
    if (!Files.exists(file)) return // fileNotFound: await quietly
    val key = fileKey()
    val len = Files.size(file)
    if ((identity != null && key != identity) // replaced: new inode
        || len < offset) { // rotated: truncated — restart
      offset = 0
      pending.reset()
    }
    identity = key
    if (len > offset) {
      val ch = Files.newByteChannel(file, StandardOpenOption.READ)
      val buf = java.nio.ByteBuffer.allocate((len - offset).toInt)
      try {
        ch.position(offset)
        var n = 0
        while (n >= 0 && buf.hasRemaining) n = ch.read(buf)
      } finally ch.close()
      // fileKey() and size() above are non-atomic: a replace-rotation
      // landing between them makes `key` the OLD identity and `len`
      // the NEW file's length, so the bytes just read came from the
      // new file at a stale offset. Re-check identity AFTER the read;
      // if it moved, discard this batch and restart from 0 next poll —
      // the new file's content is then read once, from the start
      // (nothing lost, nothing duplicated).
      if (fileKey() != key) {
        offset = 0
        pending.reset()
        identity = null
        return
      }
      pending.write(buf.array(), 0, buf.position())
      offset = len
      // split at the LAST newline: everything before it is complete
      val bytes = pending.toByteArray
      val cut = bytes.lastIndexOf('\n'.toByte)
      if (cut >= 0) {
        emit(java.util.Arrays.copyOfRange(bytes, 0, cut + 1))
        pending = new java.io.ByteArrayOutputStream()
        pending.write(bytes, cut + 1, bytes.length - cut - 1)
      }
    }
  }

  private val thread = new Thread(() => {
    if (fromEnd && Files.exists(file)) {
      offset = Files.size(file)
      identity = fileKey()
    }
    while (running.get()) {
      try poll()
      catch { case _: java.io.IOException => () } // transient: next poll retries
      Thread.sleep(pollMillis)
    }
    poll() // final drain of complete lines
  }, s"graft-tailer-$file")

  /** Stop tailing; drains already-complete lines before returning. */
  def stop(): Unit = {
    running.set(false)
    thread.join()
  }
}

object FileTailer {
  def start(file: Path, spoolDir: Path, pollMillis: Long = 1000L,
      fromEnd: Boolean = false): FileTailer = {
    Files.createDirectories(spoolDir)
    val t = new FileTailer(file, spoolDir, pollMillis, fromEnd)
    t.thread.setDaemon(true)
    t.thread.start()
    t
  }

  /** Convenience: the spooled lines as text (for assertions/tools). */
  def spooledLines(spoolDir: Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(spoolDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-")).sortBy(_.toString)
      .flatMap(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n", -1).filter(_.nonEmpty))
  }
}
