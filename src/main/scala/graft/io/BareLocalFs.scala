package graft.io

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem without per-file permission syscalls or CRC
  * sidecars — the library's recommended `fs.file.impl` for local/scratch
  * parquet (r19; VERDICT r18 "Next round" #1).
  *
  * Why: every Hadoop local-FS file CREATE applies an [[FsPermission]]
  * (`RawLocalFileSystem.setPermission`), which without the native hadoop
  * library (`libhadoop.so` — absent from plain Spark distributions) falls
  * back to `java.io.File` permission calls or a FORKED `chmod` per file
  * (`ProcessImpl.forkAndExec` in r18 driver samples), and the default
  * checksummed [[LocalFileSystem]] additionally writes+reads a `.crc`
  * sidecar per file — doubling the file census and the commit-protocol
  * rename count of every write. A tiny dynamic-partitioned parquet write
  * paid ~0.4 s of this fixed cost (DriveWriteProbe, r18), multiplied by
  * the 8-11 writes of each index lifecycle.
  *
  * What changes: permissions on written files are whatever the process
  * umask yields (setPermission is a no-op), and local files carry no
  * Hadoop CRC sidecar (parquet pages keep their own checksums). Both are
  * the semantics object stores (S3A) and most production scratch setups
  * already have; correctness of query RESULTS is untouched — this moves
  * no bytes and changes no values, it only drops per-file bookkeeping
  * syscalls. Scale note: the win is per-FILE, not per-byte, so it matters
  * exactly where small-file commit overhead dominates (index lifecycles,
  * stream sinks, checkpoints) at any cluster size that writes to local
  * disks; hdfs://-or-s3a:// paths are untouched (this binds only to the
  * `file` scheme).
  *
  * Extends [[LocalFileSystem]] (not bare [[RawLocalFileSystem]]) so
  * `FileSystem.getLocal(conf)`'s `LocalFileSystem` cast keeps working.
  */
class BareLocalFs extends LocalFileSystem(new BareRawLocalFs) {
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    // No .crc sidecars on write, no checksum verification on read: the
    // raw fs is used directly for data files (ChecksumFileSystem checks
    // these flags per create/open).
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The raw side of [[BareLocalFs]]: permission application disabled. */
class BareRawLocalFs extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
