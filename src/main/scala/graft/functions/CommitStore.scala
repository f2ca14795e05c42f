package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE atomic primitive every [[TableLog]] guarantee rides: publish
  * a small immutable file at a destination name if and only if nothing
  * exists there yet — the manifest commit CAS. Everything else in the
  * log (segments, data files, scratch) is written to fresh UUID names
  * where no two writers can ever collide; only the `manifest-<v>`
  * destination is contended, so this seam is the entire filesystem
  * contract a new storage backend must satisfy.
  *
  * Contract (what a conforming implementation MUST provide):
  *  - '''mutual exclusion''': of any number of concurrent
  *    `putIfAbsent(dst)` callers across any number of processes, at
  *    most ONE returns true; every other returns false (and the false
  *    returns happen-after some winner's content is the destination's).
  *  - '''all-or-nothing visibility''': a reader never observes a
  *    partially-written destination — either the full winning content
  *    or no file. (Object-store PUTs give this natively: the object
  *    appears only when the upload completes.)
  *  - '''no clobber''': a destination that exists is NEVER replaced.
  *
  * Three implementations, selected per filesystem SCHEME (see [[forFs]]):
  *  - [[CommitStore.AtomicLink]] — write a temp sibling, then hard-link
  *    it to the destination: `link(2)` is one atomic kernel op that
  *    fails on an existing target, so the CAS holds across OS
  *    PROCESSES, not just threads (CrossProcessSpec contends real
  *    JVMs through it). The default for `file`.
  *  - [[CommitStore.Rename]] — write a temp sibling, then
  *    exists-check + rename. Correct where rename-to-existing fails
  *    ATOMICALLY (HDFS: one namenode op) or where all committers share
  *    one JVM (guarded by a per-table mutex — see the TOCTOU note
  *    inside). The default for `hdfs` and anything unrecognized.
  *  - [[CommitStore.ConditionalCreate]] — create-exclusive straight at
  *    the destination, no rename anywhere. The shape S3 conditional
  *    PUT (`If-None-Match: *`) and GCS `ifGenerationMatch=0`
  *    preconditions satisfy, where rename is neither atomic nor cheap;
  *    requires the Hadoop connector to map `create(overwrite=false)`
  *    to that conditional write (s3a: `fs.s3a.create.conditional.enabled`,
  *    Hadoop 3.4.1+). The default for `s3/s3a/s3n/gs/oss/cos`.
  *
  * Selection can be forced per scheme
  * (`graft.tablelog.commit.store.<scheme>` in the Hadoop conf) or
  * globally (`graft.tablelog.commit.store`), value `rename` or
  * `conditional-create` — the seam the non-atomic-rename store
  * simulator specs inject through. COMPATIBILITY.md carries the
  * operator-facing version of this contract. */
trait CommitStore {

  /** Publish `content` at `dst` iff absent. True = won the version;
    * false = lost the CAS (some committer already owns the name). Any
    * other failure propagates as the underlying exception. */
  def putIfAbsent(fs: FileSystem, dst: Path, content: Array[Byte]): Boolean
}

object CommitStore {

  /** Write-temp-then-rename, the classic HDFS commit: rename to a fresh
    * name is one atomic namenode op that FAILS on an existing
    * destination, so the rename is the CAS. */
  object Rename extends CommitStore {

    /** Per-TABLE commit mutexes (keyed by the fs-QUALIFIED parent dir,
      * so `/t` and `file:/t` — one table, two spellings — share one
      * lock): LOCAL filesystems check "destination exists"
      * NON-atomically before a POSIX rename that OVERWRITES, so
      * same-JVM committers of one version must serialize the
      * exists+rename pair or the CAS silently loses a commit (two
      * same-version winners, a torn manifest/.crc pair — the 8-writer
      * contention bench caught exactly this). Keyed per directory, not
      * per destination: same-table commits of different versions are
      * already CAS-serialized, the held section is one exists + one
      * rename (~ms), and a per-version key would grow the map forever
      * on a standing ingest driver. Cross-JVM writers on a local
      * filesystem remain unsupported (use HDFS, or an object store via
      * [[ConditionalCreate]]). On HDFS the mutex is a no-op
      * correctness-wise and one exists() of overhead. */
    private val mutexes =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()

    override def putIfAbsent(fs: FileSystem, dst: Path,
                             content: Array[Byte]): Boolean = {
      val parent = dst.getParent
      fs.mkdirs(parent)
      val tmp = new Path(parent, s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(content) finally out.close()
      val mutex = mutexes.computeIfAbsent(
        fs.makeQualified(parent).toString, _ => new Object)
      val renamed = mutex.synchronized {
        !fs.exists(dst) && fs.rename(tmp, dst)
      }
      if (!renamed) fs.delete(tmp, false)
      renamed
    }
  }

  /** Create-exclusive straight at the destination — the conditional-PUT
    * commit for S3-class object stores, where `create(overwrite=false)`
    * is (or maps to) one atomic "write unless exists" operation and
    * rename is a non-atomic copy. No temp file, no rename, no mutex:
    * the store's own precondition is the CAS.
    *
    * All-or-nothing visibility is the STORE's obligation (an object
    * PUT materializes only on completion). On a plain filesystem used
    * as a stand-in — the spec simulator — a crash mid-write could
    * leave a torn destination, which readers reject loudly at manifest
    * parse; that residual is why this store is not the default for
    * `file:`/`hdfs:`. */
  object ConditionalCreate extends CommitStore {
    override def putIfAbsent(fs: FileSystem, dst: Path,
                             content: Array[Byte]): Boolean = {
      fs.mkdirs(dst.getParent)
      // the CAS loss can surface at OPEN (a connector that checks the
      // precondition up front) or at CLOSE (a conditional PUT evaluates
      // If-None-Match when the upload COMPLETES — losers learn at the
      // end), so the whole open-write-close is one attempt. Both the
      // Hadoop and java.nio already-exists flavors extend IOException;
      // any other IO failure must propagate, so gate on the destination
      // actually existing.
      try {
        val out = fs.create(dst, false)
        try out.write(content) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          if (fs.exists(dst)) false else throw e
      }
    }
  }

  /** Hard-link publish — the PROCESS-atomic local-filesystem commit.
    * Write the full content to a fresh temp sibling (straight through
    * java.nio, bypassing Hadoop's checksum wrapper), then
    * `link(2)` it to the destination name: POSIX link creation is one
    * atomic kernel operation that FAILS with EEXIST on an existing
    * destination — mutual exclusion and no-clobber hold across any
    * number of OS processes, not just threads of one JVM (the classic
    * lock-file pattern; contrast POSIX `rename(2)`, which silently
    * REPLACES). All-or-nothing visibility holds because the temp file
    * is fully written and closed before the link makes it visible
    * under the destination name, and the two names alias one inode.
    *
    * The default for `file:` — it upgrades local tables from
    * [[Rename]]'s same-JVM-only guarantee to true cross-process safety
    * (CrossProcessSpec runs real contending JVMs through it). Readers
    * go through the ordinary FileSystem API; Hadoop's checksum layer
    * tolerates the absent .crc sibling. Requires a link-capable local
    * filesystem — a store without hard links fails loudly: force
    * `rename` there via the conf override.
    *
    * On NFS specifically: `link(2)` IS atomic server-side, but NFS's
    * classic lost-reply retransmit can report a link that actually
    * SUCCEEDED as EEXIST (the server applied the first request, the
    * reply was lost, the retransmit finds the destination present) —
    * so on NFS a winner may be told it LOST the CAS. That weaker
    * contract — "false may mean you won" — is still safe for every
    * caller in this engine, because no caller trusts the boolean
    * alone: a manifest CAS that returns false re-resolves the head,
    * and an appender finds its own (runKey, batchId) already in the
    * committed manifest's ledger and returns "already committed" —
    * rows never double, the batch is never retried as new (the ledger
    * fence, [[TableLog.commitAppend]]). What NFS's ambiguity can cost
    * is only a spurious extra resolve-and-retry round, never
    * correctness. A hypothetical caller that treated `false` as "my
    * content is NOT at dst" would be wrong on NFS — don't write one. */
  object AtomicLink extends CommitStore {
    override def putIfAbsent(fs: FileSystem, dst: Path,
                             content: Array[Byte]): Boolean = {
      val q = fs.makeQualified(dst)
      require(q.toUri.getScheme == "file",
        s"atomic-link commit store needs a local path, got $q — " +
          "force graft.tablelog.commit.store=rename for this scheme")
      val dstNio = java.nio.file.Paths.get(q.toUri.getPath)
      java.nio.file.Files.createDirectories(dstNio.getParent)
      if (java.nio.file.Files.exists(dstNio)) return false // cheap fast-path
      val tmp = dstNio.resolveSibling(
        s".tmp-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, content)
      try {
        java.nio.file.Files.createLink(dstNio, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** Schemes whose stores rename by copy (non-atomic, no destination
    * precondition) but offer an atomic conditional write — the
    * object-store family where [[Rename]] is UNSOUND across processes
    * and [[ConditionalCreate]] is the native commit. */
  private val ConditionalCreateSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos")

  private[functions] def byName(name: String): CommitStore = name match {
    case "rename" => Rename
    case "conditional-create" => ConditionalCreate
    case "atomic-link" => AtomicLink
    case other => throw new IllegalArgumentException(
      s"unknown graft.tablelog.commit.store '$other' — " +
        "supported: rename, conditional-create, atomic-link")
  }

  /** The store for `fs`: the per-scheme conf override, then the global
    * conf override, then the scheme default (`file` → [[AtomicLink]],
    * object stores → [[ConditionalCreate]], everything else →
    * [[Rename]]). */
  def forFs(fs: FileSystem): CommitStore = {
    val conf = fs.getConf
    val scheme = Option(fs.getScheme).getOrElse("")
    val name = Option(conf.get(s"graft.tablelog.commit.store.$scheme"))
      .orElse(Option(conf.get("graft.tablelog.commit.store")))
      .getOrElse(
        if (ConditionalCreateSchemes(scheme)) "conditional-create"
        else if (scheme == "file") "atomic-link"
        else "rename")
    byName(name)
  }
}
