package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only Hadoop FileSystem under its own scheme (`graftmem://`),
  * backed by local disk. Exists so SourcesSpec can prove the source/sink
  * helpers resolve a FileSystem per path URI (the s3a:// code path)
  * rather than assuming the default `file://` FS — the closest honest
  * stand-in for an object store in a container with no network.
  */
class GraftMemFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftmem"
  override def getUri: URI = URI.create("graftmem:///")
}
