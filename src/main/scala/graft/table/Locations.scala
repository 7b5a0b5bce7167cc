package graft.table

import graft.core.Murmur3

/** Write-location strategy (reference `table/locations.go:38-183`).
  *
  * The SIMPLE provider writes data under `$location/data` and metadata
  * under `$location/metadata`, each overridable per table with
  * `write.data.path` / `write.metadata.path` (reference
  * `locations.go:88-113`) — how a deployment points hot data at a
  * different bucket/storage class than the table root.
  *
  * The OBJECT-STORAGE provider (`write.object-storage.enabled=true`,
  * reference `locations.go:114-160`) spreads data files across
  * murmur3-entropy key prefixes: 20 hash bits of the file name rendered
  * as a binary string and split into 3 directories of 4 bits plus an
  * 8-bit remainder (constants `locations.go:32-36`). This is specifically
  * a 100 TB feature: S3-class stores throttle per key PREFIX, so a hot
  * table writing thousands of files a minute under one `data/` prefix
  * hits the per-prefix IOPS cap — the entropy fan-out spreads load across
  * 2^12 directory prefixes (and makes orphan listing parallelizable by
  * prefix). `write.object-storage.partitioned-paths=false` additionally
  * drops partition dirs from the path (values live in manifests anyway),
  * keeping keys uniformly distributed even for skewed partitions.
  */
object Locations {
  val ObjectStoreEnabledKey = "write.object-storage.enabled"
  val PartitionedPathsKey = "write.object-storage.partitioned-paths"
  val DataPathKey = "write.data.path"
  val MetadataPathKey = "write.metadata.path"

  // reference locations.go:32-36
  private val HashBits = 20
  private val EntropyDirLength = 4
  private val EntropyDirDepth = 3

  final case class LocationProvider(
      dataPath: String,
      metadataPath: String,
      objectStore: Boolean,
      partitionedPaths: Boolean) {

    /** Final location for a data file. `partitionDirs` is the
      * `name=value/...` relative path of a partitioned write (None for
      * unpartitioned): the simple provider and partitioned-paths=true
      * keep it; partitioned-paths=false drops it.
      */
    def newDataLocation(fileName: String, partitionDirs: Option[String] = None): String =
      if (!objectStore) partitionDirs match {
        case Some(p) => s"$dataPath/$p/$fileName"
        case None => s"$dataPath/$fileName"
      } else {
        val hashed = entropyDirs(fileName)
        partitionDirs match {
          case Some(p) if partitionedPaths => s"$dataPath/$hashed/$p/$fileName"
          case None if partitionedPaths => s"$dataPath/$hashed/$fileName"
          // partitioned-paths=false: the remainder segment concatenates
          // with the name (reference locations.go:156 `hashedPath + "-" +
          // dataFileName`), and value dirs are dropped outright
          case _ => s"$dataPath/$hashed-$fileName"
        }
      }

    def newMetadataLocation(fileName: String): String = s"$metadataPath/$fileName"
  }

  /** Port of `computeHash` + `dirsFromHash` (reference
    * `locations.go:121-148`): murmur3-32 of the file name, low 20 bits
    * (top bit OR'd in to preserve leading zeroes through the binary
    * render), split as 4/4/4 directories + the 8-bit remainder.
    */
  private[table] def entropyDirs(fileName: String): String = {
    val topMask = 1 << HashBits
    val hashCode = (Murmur3.hashString(fileName) & (topMask - 1)) | topMask
    val bin = java.lang.Integer.toBinaryString(hashCode)
    val bits = bin.substring(bin.length - HashBits)
    val total = EntropyDirDepth * EntropyDirLength
    val dirs = (0 until total by EntropyDirLength)
      .map(i => bits.substring(i, i + EntropyDirLength))
    (dirs :+ bits.substring(total)).mkString("/")
  }

  /** Resolve the provider for a table root + properties (reference
    * `LoadLocationProvider`, `locations.go:173-183`). Version metadata
    * JSON files stay catalog-managed ([[graft.meta.FileCatalog]] owns
    * `metadata/v{N}.metadata.json` naming); this provider governs every
    * file the TABLE writes — data, delete files, manifests, manifest
    * lists, Puffin blobs.
    */
  def forTable(location: String, properties: Map[String, String]): LocationProvider =
    LocationProvider(
      dataPath = properties.getOrElse(DataPathKey, s"$location/data"),
      metadataPath = properties.getOrElse(MetadataPathKey, s"$location/metadata"),
      objectStore = properties.get(ObjectStoreEnabledKey).exists(_.toBoolean),
      partitionedPaths = properties.get(PartitionedPathsKey).forall(_.toBoolean))
}
