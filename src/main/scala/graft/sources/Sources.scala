package graft.sources

import graft.core.PendingDoc
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input sources for the extraction pipeline.
  *
  * `fromDirectory` is the DirectoryIngestor analogue
  * (`/root/reference/ingestors/directory.py`): where the reference walks a
  * filesystem tree and queues each file, the Spark-native source is the
  * built-in `binaryFile` reader — a real DataSourceV2 scan that is
  * partitioned, predicate-prunable on path/size/modificationTime, and
  * works against any Hadoop-compatible filesystem (local, HDFS, S3A) —
  * exactly what a 100 TB crawl root needs. Document ids are the paths
  * relative to the root, matching the reference's Folder→child naming. */
object Sources {

  /** Junk entries the reference never queues (`directory.py:11`
    * SKIP_ENTRIES); any path segment matching one is skipped, mirroring
    * the recursive crawl pruning. */
  val SkipEntries: Set[String] = Set(".git", ".hg", "__MACOSX", ".gitignore")

  def fromDirectory(spark: SparkSession, root: String,
                    pathGlobFilter: Option[String] = None,
                    maxBytesPerFile: Long = 512L * 1024 * 1024,
                    skipEntries: Set[String] = SkipEntries): Dataset[PendingDoc] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    val df = pathGlobFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
      .load(root)
      .filter(col("length") <= maxBytesPerFile)
    // Resolve the root the same way the binaryFile scan reports row paths:
    // through the Hadoop FileSystem, so HDFS/S3A/file: roots, trailing
    // slashes, and relative local paths all relativize correctly.
    val hadoopRoot = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(hadoopRoot)
    // binaryFile reports Path.toString form (file:/x); also accept the URI
    // form (file:///x) in case a source reports that instead
    val rootPrefixes = Seq(qualified.toString, qualified.toUri.toString)
      .map(_.stripSuffix("/"))
    val skip = skipEntries
    df.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val rel = {
          val p = rootPrefixes.find(path.startsWith).fold(path)(path.stripPrefix)
            .stripPrefix("/")
          if (p.isEmpty) path.split('/').last else p
        }
        val name = rel.split('/').last
        PendingDoc(rel, "", Seq.empty, 0, name, "", bytes)
      }
      .filter(d => !d.doc_id.split('/').exists(skip.contains))
  }
}
