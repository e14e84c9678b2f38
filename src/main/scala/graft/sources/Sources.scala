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
    val prefixes = rootPrefixes(spark, root)
    val skip = skipEntries
    df.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val rel = relativize(path, prefixes)
        val name = rel.split('/').last
        PendingDoc(rel, "", Seq.empty, 0, name, "", bytes)
      }
      .filter(d => !d.doc_id.split('/').exists(skip.contains))
  }

  /** Resolve the root the same way the binaryFile scan reports row paths:
    * through the Hadoop FileSystem, so HDFS/S3A/file: roots, trailing
    * slashes, and relative local paths all relativize correctly.
    * binaryFile reports Path.toString form (file:/x); also accept the URI
    * form (file:///x) in case a source reports that instead. */
  private def rootPrefixes(spark: SparkSession, root: String): Seq[String] = {
    val hadoopRoot = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(hadoopRoot)
    Seq(qualified.toString, qualified.toUri.toString).map(_.stripSuffix("/"))
  }

  private def relativize(path: String, prefixes: Seq[String]): String = {
    val p = prefixes.find(path.startsWith).fold(path)(path.stripPrefix)
      .stripPrefix("/")
    if (p.isEmpty) path.split('/').last else p
  }

  /** Record-level WARC source (beyond the reference: the Common Crawl
    * input shape). Scans `*.warc` / `*.warc.gz` under `root` and emits
    * one PendingDoc per kept payload (2xx HTTP responses and resource
    * records — see [[graft.extract.Warc.payloads]]): doc_id =
    * `<root-relative path>#<record index>` (stable, resume-friendly),
    * file_name = the WARC-Target-URI (what the classifier routes on),
    * mime_hint = the HTTP Content-Type. Parallelism is file-granular —
    * the standard crawl shape of one task per ~1 GB warc; the flatMap is
    * narrow, so payload bytes never shuffle. */
  def fromWarcs(spark: SparkSession, root: String,
                maxBytesPerFile: Long = Int.MaxValue.toLong)
      : Dataset[PendingDoc] = {
    val df = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.warc*")
      .load(root)
    fromWarcListing(spark, df, rootPrefixes(spark, root), maxBytesPerFile)
  }

  /** Mime hint planted on oversize listing rows: [[graft.pipeline.Dispatch]]
    * converts it into the reference's processingError failure row
    * (`manager.py:229-234`) so an over-cap file surfaces in the lineage
    * instead of vanishing in a silent filter. */
  val OversizeMime = "application/x-graft-oversize"

  /** Listing → pending docs, split at the byte cap. Any requested cap is
    * clamped to the JVM byte-array ceiling (`Int.MaxValue − 8`) rather
    * than rejected — the previous 2 GiB (= 2^31) default admitted a file
    * of exactly 2 GiB, which binaryFile cannot materialize and fails on
    * opaquely, and callers written against that old default keep working.
    * Oversize rows never touch `content` (the scan prunes the column), so
    * listing them is free; they emit a zero-byte [[OversizeMime]] pending
    * doc that becomes a per-file failure row downstream. */
  private[graft] def fromWarcListing(spark: SparkSession,
                                       listing: org.apache.spark.sql.DataFrame,
                                       prefixes: Seq[String],
                                       maxBytesPerFile: Long): Dataset[PendingDoc] = {
    import spark.implicits._
    require(maxBytesPerFile > 0,
      s"maxBytesPerFile must be positive: $maxBytesPerFile")
    // clamp rather than reject: a caller passing the old 2 GiB default
    // (or anything larger) gets the JVM byte-array ceiling, which is the
    // strictest cap binaryFile can materialize anyway
    val cap = math.min(maxBytesPerFile, Int.MaxValue.toLong - 8)
    val ok = listing.filter(col("length") <= cap)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap((warcPending(prefixes) _).tupled)
    val over = listing.filter(col("length") > cap)
      .select(col("path")).as[String]
      .map { p =>
        val rel = relativize(p, prefixes)
        PendingDoc(rel, "", Seq.empty, 0, rel, OversizeMime,
          Array.empty[Byte])
      }
    ok.union(over)
  }

  /** One WARC file → its kept payloads as pending docs (narrow). */
  private def warcPending(prefixes: Seq[String])(path: String,
                          bytes: Array[Byte]): Iterator[PendingDoc] = {
    val rel = relativize(path, prefixes)
    graft.extract.Warc.payloads(graft.extract.Warc.plainBytes(bytes))
      .iterator.zipWithIndex.map { case ((uri, mime, body), i) =>
        // the Content-Type header is attacker-controlled; a value that
        // collides with an internal dispatch sentinel must not be able
        // to spoof the sentinel's short-circuit path — blank it so the
        // payload classifies by magic bytes
        val safeMime =
          if (mime == OversizeMime ||
              mime == graft.extract.Rar.UnsupportedMemberMime) ""
          else mime
        PendingDoc(s"$rel#$i", "", Seq.empty, 0, uri, safeMime, body)
      }
  }

  /** Streaming variant of [[fromWarcs]]: `.warc` / `.warc.gz` files
    * appearing under `root` become micro-batches of response payloads —
    * the continuous-crawl ingest shape. File discovery is checkpointed by
    * Structured Streaming, so a restarted job resumes at the first
    * unprocessed warc; feed the result to
    * [[graft.streaming.StreamingIngest.extractionQueryToTable]] for
    * atomic per-batch snapshot commits. */
  def streamWarcs(spark: SparkSession, root: String): Dataset[PendingDoc] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // binaryFile's fixed schema, stated explicitly as file streams require
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val prefixes = rootPrefixes(spark, root)
    spark.readStream.format("binaryFile")
      .schema(schema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.warc*")
      .load(root)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap((warcPending(prefixes) _).tupled)
  }
}
