package graft.functions

import java.net.URI
import java.nio.channels.{Channels, FileChannel}
import java.nio.file.{Files, StandardOpenOption}

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A Hadoop filesystem that models an S3-CLASS OBJECT STORE on local
  * disk — the simulator the CommitStore race matrix runs through:
  *
  *  - '''rename is a non-atomic copy with NO destination
  *    precondition''': `rename(src, dst)` silently REPLACES an existing
  *    `dst` (object stores rename by copy+delete; there is no "fail if
  *    exists" flavor). Any commit protocol whose CAS is
  *    "rename-fails-on-existing" silently loses commits here — which is
  *    exactly what [[CommitStoreSpec]] demonstrates, and why
  *    [[CommitStore.Rename]] is the wrong store for this scheme.
  *  - '''create-exclusive is an atomic conditional PUT''': with
  *    `overwrite = false`, bytes accumulate invisibly (a local temp —
  *    the in-flight multipart upload) and the destination materializes
  *    ATOMICALLY at `close()` via a hard link that fails if the name
  *    exists — full content or no file, losers learn at COMPLETION,
  *    exactly the `If-None-Match: *` shape. No exists-check TOCTOU, no
  *    partially-written destination ever visible.
  *
  * Registered under the `nonatomic:` scheme via
  * [[NonAtomicStoreFs.install]]. Extends [[RawLocalFileSystem]], so no
  * `.crc` sidecars — matching object stores, which have none. */
class NonAtomicStoreFs extends RawLocalFileSystem {

  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (!s.exists()) false
    else {
      java.nio.file.Files.move(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      true
    }
  }

  private def conditionalPut(f: Path): FSDataOutputStream = {
    val file = pathToFile(f)
    Option(file.getParentFile).foreach(_.mkdirs())
    val tmp = Files.createTempFile(file.getParentFile.toPath, ".put-", ".tmp")
    val ch = FileChannel.open(tmp,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    val out = new java.io.FilterOutputStream(Channels.newOutputStream(ch)) {
      // atomic materialization at completion: the hard link claims the
      // destination name in one syscall — (nio) FileAlreadyExistsException
      // when another writer's PUT completed first, with the full content
      // visible the instant the name is
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len) // bulk passthrough (FilterOutputStream loops bytes)
      override def close(): Unit = {
        super.close()
        try Files.createLink(file.toPath, tmp)
        finally Files.deleteIfExists(tmp)
      }
    }
    new FSDataOutputStream(out, null)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalPut(f)

  // RawLocalFileSystem implements this overload DIRECTLY (it does not
  // route through the permission variant) — FileSystem.create(f, false)
  // lands here, so it must take the conditional-PUT path too
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    else conditionalPut(f)
}

object NonAtomicStoreFs {

  /** Register the scheme and pin its commit store to conditional-create
    * — the per-scheme conf override [[CommitStore.forFs]] honors. */
  def install(conf: org.apache.hadoop.conf.Configuration): Unit = {
    conf.set("fs.nonatomic.impl", classOf[NonAtomicStoreFs].getName)
    conf.set("graft.tablelog.commit.store.nonatomic", "conditional-create")
  }
}
