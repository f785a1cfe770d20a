package graft.etl

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A non-`file:` Hadoop filesystem for the object-store contract test:
  * local storage served under the `graftfs://` scheme. Registered as
  * `fs.graftfs.impl`, it proves the engine's glob, partition
  * discovery/pruning, planned-vs-read file audit, warehouse writes and
  * compaction swap all run through the FileSystem API with no hard-coded
  * `file:` assumptions — the reference reads `s3://` directly
  * (reference src/sources/aws_cur.py:60-66), so scheme-portability is
  * part of its contract. */
class GraftFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** Local-backed stand-in registered as `fs.s3a.impl` for the OFFLINE
  * s3a contract test (no hadoop-aws jar / no egress in this
  * environment): proves the `s3a://` URI surface — EngineConfig's
  * `fs.s3a.*` conf plumbing, CurSource scans, sync, and the
  * object-store (manifest) compaction route that `s3a` selects BY
  * SCHEME — without a live store. Risk left uncovered is exactly the
  * real S3AFileSystem's own behavior, which is the hadoop-aws project's
  * contract, not this engine's. */
class S3aStubFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create("s3a:///")

  /** Spark lists `s3a` paths through the recursive `FileSystem.listFiles`
    * fast path (`spark.sql.sources.useListFilesFileSystemList`, default
    * includes s3a), whose default implementation recurses through THIS
    * method and materializes `LocatedFileStatus` — which triggers
    * RawLocalFileSystem's lazy permission load, and that does
    * `new java.io.File(uri)` on a non-`file` URI. Pre-materialize the
    * permission (object stores have no POSIX permissions anyway) so the
    * engine exercises the same listing path it would on real s3a. */
  override def listLocatedStatus(
      f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = {
    import org.apache.hadoop.fs.{FileStatus, LocatedFileStatus, Path, RemoteIterator}
    val it = listStatus(f).iterator
    new RemoteIterator[LocatedFileStatus] {
      override def hasNext: Boolean = it.hasNext
      override def next(): LocatedFileStatus = {
        val s = it.next()
        val plain = new FileStatus(s.getLen, s.isDirectory, s.getReplication,
          s.getBlockSize, s.getModificationTime, s.getAccessTime,
          org.apache.hadoop.fs.permission.FsPermission.getFileDefault, "", "",
          s.getPath)
        new LocatedFileStatus(plain, Array.empty)
      }
    }
  }
}
