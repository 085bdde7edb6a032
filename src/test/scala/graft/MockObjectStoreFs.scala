package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A mock object-store FileSystem for the cloud-integration spec: the
  * `mocks3://` scheme backed by the local filesystem. Registering it
  * via the PUBLIC Hadoop contract (`fs.mocks3.impl`) and reading
  * through `Tables.read` exercises the exact code path a real
  * connector (hadoop-aws, gcs-connector) uses — scheme resolution,
  * directory listing, split planning, footer reads — with zero
  * network. `mocks3://bucket/<abs-path>` maps to `<abs-path>` locally.
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3://bucket")
  // strip scheme+authority so RawLocalFileSystem sees plain local paths
  override def pathToFile(path: Path): java.io.File =
    new java.io.File(path.toUri.getPath)
}
