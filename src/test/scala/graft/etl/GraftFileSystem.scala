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
