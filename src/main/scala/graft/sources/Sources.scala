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

  def fromDirectory(spark: SparkSession, root: String,
                    pathGlobFilter: Option[String] = None,
                    maxBytesPerFile: Long = 512L * 1024 * 1024): Dataset[PendingDoc] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    val df = pathGlobFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
      .load(root)
      .filter(col("length") <= maxBytesPerFile)
    val rootUri = "file:" + new java.io.File(root).getAbsolutePath
      .stripSuffix("/")
    df.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val rel = {
          val p = path.stripPrefix(rootUri).stripPrefix("/")
          if (p.isEmpty) path.split('/').last else p
        }
        val name = rel.split('/').last
        PendingDoc(rel, "", Seq.empty, 0, name, "", bytes)
      }
  }
}
