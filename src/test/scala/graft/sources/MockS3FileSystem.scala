package graft.sources

import java.net.URI
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataOutputStream, FileAlreadyExistsException, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local object-store stand-in with S3 create semantics (reference
  * `src/storage/objects.rs:170-330`: the object_store backend has no
  * atomic create-exclusive — never-overwrite is a list/HEAD then an
  * unconditional PUT, and concurrent PUTs of one key are last-writer-wins).
  *
  * Backed by the local disk but registered under its own `mocks3://`
  * scheme, so the sink takes its NON-file branch (Hadoop `create(target,
  * overwrite=false)` claim + `FileContext.rename(OVERWRITE)` commit)
  * exactly as it would against S3A. `create(overwrite = false)` is
  * deliberately check-then-act: a HEAD (exists), an OPTIONALLY BLOCKING
  * window ([[MockS3FileSystem.armWindow]] — lets a spec hold one writer
  * between its HEAD and its PUT), then an unconditional PUT — the exact
  * race the sink's scaladoc caveat documents for object stores.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  // RawLocalFileSystem routes the (Path, boolean) entry through BOTH of
  // these overloads depending on call depth — intercept each
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!overwrite) headThenPut(f,
      super.create(f, permission, true, bufferSize, replication, blockSize, progress))
    else super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!overwrite) headThenPut(f,
      super.create(f, true, bufferSize, replication, blockSize, progress))
    else super.create(f, overwrite, bufferSize, replication, blockSize, progress)

  private def headThenPut(f: Path, put: => FSDataOutputStream): FSDataOutputStream = {
    if (exists(f)) throw new FileAlreadyExistsException(s"Object exists: $f")
    MockS3FileSystem.holdInWindow() // the HEAD→PUT gap
    put // the PUT itself never checks: S3 has no conditional write here
  }

  // Raw local statuses load permissions LAZILY via `new java.io.File(uri)`,
  // which rejects a non-file scheme; object stores report synthetic
  // permissions anyway, so make them eager and synthetic here
  private def sanitize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "", "", s.getPath)

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(sanitize)
  override def getFileStatus(f: Path): FileStatus =
    sanitize(super.getFileStatus(f))
}

object MockS3FileSystem {
  /** One-shot (window, entered) latch pair consumed by the next
    * `create(overwrite=false)` caller: the caller signals `entered` after
    * its HEAD, then blocks on `window` until the spec releases it.
    */
  private val armed =
    new AtomicReference[(CountDownLatch, CountDownLatch)](null)

  def armWindow(): (CountDownLatch, CountDownLatch) = {
    val pair = (new CountDownLatch(1), new CountDownLatch(1))
    armed.set(pair)
    pair
  }

  private def holdInWindow(): Unit = {
    val pair = armed.getAndSet(null)
    if (pair != null) {
      pair._2.countDown()
      pair._1.await()
    }
  }

  /** Register the scheme on a Hadoop conf: both the `FileSystem` binding
    * (sink writes, source reads) and the `AbstractFileSystem` binding
    * (the commit path's `FileContext.rename(OVERWRITE)`).
    */
  def install(conf: Configuration): Unit = {
    conf.set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    conf.set("fs.AbstractFileSystem.mocks3.impl", classOf[MockS3Abstract].getName)
  }
}

/** `FileContext` binding for the `mocks3://` scheme (required constructor
  * shape `(URI, Configuration)`).
  */
class MockS3Abstract(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockS3FileSystem, conf, "mocks3", false)
