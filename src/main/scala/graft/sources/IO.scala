package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Typed readers/writers for the engine's source/sink surface
  * (SURVEY.md §2.1: S1-S3 scans, K1-K3 sinks), plus the write-then-reread
  * combinators the reference pipelines embody
  * (/root/reference/src/main/scala/tiago/cebola/challenge.scala:104-112,
  * 186-196, 219-229).
  */
object IO {

  /** The reference's custom CSV field delimiter (challenge.scala:11). */
  val SectionDelimiter = "§" // §

  /** S1/S2 — CSV scan with header + schema inference. Inference costs an
    * extra eager pass over the data; at 100 TB callers should pass an
    * explicit schema instead (see `readCsvWithSchema`).
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      delimiter: String = ",",
      header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Schema-pinned CSV scan — the scale path: no inference pass. */
  def readCsvWithSchema(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .schema(schema)
      .csv(path)

  /** S3 — parquet scan. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Widen a NARROW frame to session parallelism before a heavy per-row
    * pass. The testdata parquet files carry a single row group, so the
    * scan is ONE task no matter how `maxPartitionBytes` /
    * `minPartitionNum` slice the byte range (parquet can only split at
    * row-group boundaries) — and a decode/hash kernel downstream of it
    * then runs serially on any machine (measured r20: the 5000-media
    * fingerprint pass held 1 partition on 32 cores). At production
    * scale the scan already carries >= the session width and this is a
    * NO-OP — no exchange is added; the width derives from the input,
    * not from a constant tuned to either regime (guide §2
    * "scale-adaptive partitioning").
    */
  def widened(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Testdata table loader (TESTDATA.md). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** K1 — CSV sink, header + custom delimiter, overwrite. */
  def writeCsv(
      df: DataFrame,
      path: String,
      delimiter: String = ",",
      header: Boolean = true): Unit =
    df.write
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .mode(SaveMode.Overwrite)
      .csv(path)

  /** K2 — parquet sink, gzip-compressed, overwrite. */
  def writeParquetGzip(df: DataFrame, path: String): Unit =
    df.write
      .option("compression", "gzip")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Write df as delimited CSV then read it back with fresh schema
    * inference — the Part-2 shape (challenge.scala:104-112). The re-read
    * frame's schema can legitimately differ from the written frame's
    * (inference over the clean delimited text re-types columns).
    */
  def csvRoundTrip(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      delimiter: String = SectionDelimiter): DataFrame = {
    writeCsv(df, path, delimiter)
    readCsv(spark, path, delimiter)
  }

  /** Write df as gzip parquet then read it back — the Part-4/5 shape
    * (challenge.scala:186-196). Acts as a materialization barrier: the
    * re-read plan starts from files, not from the upstream lineage.
    */
  def parquetGzipRoundTrip(
      spark: SparkSession,
      df: DataFrame,
      path: String): DataFrame = {
    writeParquetGzip(df, path)
    readParquet(spark, path)
  }

  /** Write df as ZSTD parquet then read it back. Gzip is the reference's
    * committed-artifact codec (K2 keeps it for parity); zstd is what a
    * 100 TB deployment actually runs — comparable ratio at several times
    * the (de)compression throughput, so scan-bound queries stay CPU-light.
    */
  def parquetZstdRoundTrip(
      spark: SparkSession,
      df: DataFrame,
      path: String): DataFrame = {
    df.write.option("compression", "zstd").mode(SaveMode.Overwrite).parquet(path)
    readParquet(spark, path)
  }

  /** Write df as JSON lines then read it back with inference — extends the
    * source/sink matrix beyond the reference's CSV/parquet (SURVEY.md §2.1).
    * JSON inference loses integer-vs-long width and column order; callers
    * re-select/cast. At 100 TB, JSON is an interchange format, not a scan
    * format — the round-trip exists for capability, parquet is the scale
    * path.
    */
  def jsonRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    spark.read.json(path)
  }

  /** Write df as zlib ORC then read it back — the columnar-format twin of
    * [[parquetGzipRoundTrip]]; exercises the second vectorized-scan format.
    */
  def orcRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.option("compression", "zlib").mode(SaveMode.Overwrite).orc(path)
    spark.read.orc(path)
  }

  /** Write df hive-partitioned by `partitionCol` then read it back — the
    * layout whose directory pruning PlanAuditSpec asserts. The partition
    * column round-trips through the directory name (string-typed on
    * re-read for non-inferable types).
    */
  def partitionedParquetRoundTrip(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      partitionCol: String): DataFrame = {
    df.write.partitionBy(partitionCol).mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** Scratch dir for round-trip sinks (never inside /root/repo). */
  def scratchDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(totalBytes / targetBytes) files and return the re-read frame.
    *
    * The small-files problem is the classic operational failure mode of a
    * long-running ingest at scale — a 100 TB table accreted in
    * per-micro-batch writes ends up as millions of KB-sized files, and
    * every scan pays per-file open/footer/seek costs that dwarf the read
    * itself (plus NameNode/listing pressure). Compaction restores
    * scan-sized files.
    *
    * Sizing comes from the driver's file LISTING (byte sizes — no Spark
    * job, no footer reads), and the rewrite uses `coalesce`, a NARROW
    * dependency: input files are concatenated into output partitions
    * without a shuffle (plan-asserted in the spec). Coalesce inherits the
    * input's file order, so an already-sorted (e.g. Z-ordered) layout
    * keeps its clustering; if input files are heavily skewed in size,
    * callers trade the shuffle for balance with `repartition` instead.
    */
  def compactParquet(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(srcDir)
    val fs = dir.getFileSystem(conf)
    val it = fs.listFiles(dir, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) totalBytes += st.getLen
    }
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcDir)
      .coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    readParquet(spark, dstDir)
  }

  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Exact row count of a parquet table from file-footer metadata — NO Spark
    * job: the driver lists the directory once and reads each footer's record
    * count (a few KB per file), memoized per path for the session lifetime.
    *
    * This exists so operators that size themselves to the corpus (the
    * adaptive LSH plane count in [[graft.operators.Similarity]]) don't run a
    * full count() job inside every query invocation. At 100 TB the same
    * number should come from catalog statistics (ANALYZE TABLE / metastore
    * rowCount) rather than a driver listing of millions of footers — which
    * is why the operators also accept the count-derived parameter directly
    * from the caller; this helper is the no-catalog fallback.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long =
    rowCountCache.computeIfAbsent(path, (p: String) => {
      val conf = spark.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(p)
      val fs = dir.getFileSystem(conf)
      // recursive: hive-partitioned layouts nest data files under
      // partition directories — a flat listing would silently count 0
      val it = fs.listFiles(dir, true)
      var total = 0L
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try total += reader.getRecordCount finally reader.close()
        }
      }
      total
    })

  private val columnBytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total UNCOMPRESSED byte size of one column across a parquet table,
    * from file-footer row-group metadata — NO Spark job, memoized per
    * (path, column) like [[parquetRowCount]]. This is the data-derived
    * volume signal for operators whose cost tracks a column's content
    * size rather than the row count (the substring-dedup window estimate:
    * token volume ≈ text bytes, which a rows×constant heuristic gets
    * badly wrong on long-document corpora). Uncompressed chunk size
    * includes encoding overhead (length prefixes, rep/def levels), so it
    * slightly overestimates raw content bytes — the right direction for
    * a materialization gate. Same catalog-statistics caveat as the row
    * count: at 100 TB this number comes from ANALYZE TABLE column stats,
    * and callers accept the derived parameter directly.
    */
  def parquetColumnUncompressedBytes(
      spark: SparkSession,
      path: String,
      column: String): Long =
    columnBytesCache.computeIfAbsent(s"$path#$column", (_: String) => {
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      val it = fs.listFiles(dir, true)
      var total = 0L
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try reader.getRowGroups.asScala.foreach { rg =>
            rg.getColumns.asScala.foreach { c =>
              if (c.getPath.toDotString == column) total += c.getTotalUncompressedSize
            }
          } finally reader.close()
        }
      }
      total
    })

  /** Scheme-aware existence probe for a persisted artifact — resolved
    * through the Hadoop FileSystem of the path's scheme, NOT
    * `java.nio.file.Files` (which is local-only and would report every
    * HDFS/S3-backed artifact as missing, re-persisting — and racing
    * on — it every invocation). Centralized here so the filesystem
    * assumption lives in exactly one place.
    *
    * A DIRECTORY artifact additionally requires the `_SUCCESS` job
    * marker: every artifact in this library is written by
    * `df.write.parquet`, whose committer drops the marker only after the
    * job commits, so a prime that crashed (or is still running in
    * another process) leaves a directory that must read as ABSENT — bare
    * path existence would serve its partial files. Plain files (no
    * committer protocol) keep the simple existence check.
    */
  def artifactExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && (fs.getFileStatus(p).isFile ||
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
  }

  /** Thrown by [[readStamped]] when the on-disk artifact does not match
    * its declared schema. A dedicated type (still an
    * `IllegalStateException` for callers matching broadly) so
    * [[servedArtifact]]'s self-heal can scope its delete-and-re-prime to
    * GENUINE drift — an unrelated `IllegalStateException` surfacing
    * through the read must never trigger recursive deletion of a healthy
    * artifact.
    */
  final class ArtifactDriftException(msg: String) extends IllegalStateException(msg)

  /** Read a persisted artifact and RE-STAMP the producer's declared
    * nullability onto the plan — the serve-path seam every stored index
    * in this library reads through.
    *
    * Why it exists: parquet reads mark every column nullable, and the
    * consumers' whole-stage codegen then pays a null branch per
    * expression per row — measured on the media fingerprint face at ×100
    * as 39-41 s off a plain read vs 25 s re-stamped (the banded join's 68
    * band-key expressions), invisible in the plan shape. The original fix
    * (`createDataFrame(df.rdd, schema)`) forfeited the vectorized parquet
    * scan and inserted a Row-deserialization pass; this seam instead
    * projects each non-null column through a Catalyst `AssertNotNull`, so
    * the vectorized scan SURVIVES, downstream operators see
    * `nullable = false` attributes, and — unlike a raw `KnownNotNull`
    * tag, which would make an actually-null value silent codegen
    * garbage — a corrupt artifact fails loudly at the first null.
    * Array columns declared `containsNull = false` re-stamp their
    * element nullability through a `transform(x -> assert_not_null(x))`
    * pass (a cast cannot narrow `containsNull`).
    *
    * The read schema is VALIDATED against `expected` (field names and
    * types, nullability ignored — parquet cannot round-trip it) before
    * any stamping, so an artifact written by a different producer, a
    * partially-written file, or a schema drift surfaces as one
    * descriptive error naming the artifact path — not as NPEs or
    * mis-bound columns deep in codegen. (The content-keyed path digest
    * only guards staleness of the SOURCE data, not the artifact bytes.)
    */
  def readStamped(
      spark: SparkSession,
      path: String,
      expected: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{LambdaFunction, UnresolvedNamedLambdaVariable}
    import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
    import org.apache.spark.sql.catalyst.expressions.ArrayTransform
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, StructField}
    expected.fields.foreach { f =>
      def hasStruct(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.StructType => true
        case ArrayType(et, _) => hasStruct(et)
        case org.apache.spark.sql.types.MapType(k, v, _) => hasStruct(k) || hasStruct(v)
        case _ => false
      }
      // declaration-site guard, not drift: the stamp narrows top-level and
      // array-ELEMENT nullability only, so a struct field's inner
      // nullability would silently stay nullable — reject the declaration
      // until the stamp learns to recurse, rather than serve a half-stamp
      require(!hasStruct(f.dataType),
        s"readStamped cannot re-stamp inner-field nullability of struct-typed " +
          s"column '${f.name}' (${f.dataType.simpleString}) declared for $path; " +
          "flatten the artifact or extend the stamp before declaring structs")
    }
    val raw = readParquet(spark, path)
    val actual = raw.schema
    def mismatch(why: String): Nothing = throw new ArtifactDriftException(
      s"stored artifact at $path does not match its declared schema ($why); " +
        s"expected ${expected.simpleString}, found ${actual.simpleString} — " +
        "the artifact was produced by a different writer or is corrupt; " +
        "delete it to re-prime")
    if (actual.length != expected.length)
      mismatch(s"field count ${actual.length} != ${expected.length}")
    expected.fields.zip(actual.fields).foreach { case (e, a) =>
      if (e.name != a.name) mismatch(s"field '${a.name}' where '${e.name}' expected")
      if (!GraftSqlBridge.sameTypeIgnoreNullability(e.dataType, a.dataType))
        mismatch(s"field '${e.name}' has type ${a.dataType.simpleString}, " +
          s"expected ${e.dataType.simpleString}")
    }
    val cols = expected.fields.map { case StructField(name, dt, nullable, _) =>
      var e = GraftSqlBridge.expression(col(name))
      dt match {
        case ArrayType(_, false) =>
          // element-level stamp: transform's result containsNull is the
          // lambda body's nullability, the one plan-level way to narrow it
          val x = UnresolvedNamedLambdaVariable(Seq("x"))
          e = ArrayTransform(e, LambdaFunction(AssertNotNull(x), Seq(x)))
        case _ => ()
      }
      if (!nullable) e = AssertNotNull(e, Seq(s"stored artifact $path column $name declared non-null"))
      GraftSqlBridge.column(e).as(name)
    }
    raw.select(cols.toSeq: _*)
  }

  /** All-non-null all-BIGINT struct — the shape of most persisted
    * id/count artifacts; convenience for [[readStamped]] declarations.
    */
  def longSchema(names: String*): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** The stored-artifact serve contract in one place: prime the artifact
    * if (and only if) it is absent — existence resolved scheme-aware via
    * [[artifactExists]] — then serve it through the [[readStamped]]
    * nullability seam. Every self-priming stored row threads through
    * here.
    *
    * SELF-HEALING on schema drift: these artifacts are pure caches of a
    * deterministic build, so when [[readStamped]]'s validation rejects
    * the on-disk bytes (a producer whose SCHEMA changed without a
    * version-token bump, a foreign writer — [[ArtifactDriftException]])
    * or the directory is unreadable outright (a half-written/empty dir
    * that somehow carries a `_SUCCESS` marker —
    * `AnalysisException`), the right move is delete-and-re-prime, not
    * crash — the loud error is reserved for the re-primed artifact
    * still failing validation, which means the DECLARED schema is out
    * of step with the producer (a real bug at the declaration site).
    * The heal catch is scoped to exactly those two types: any other
    * exception (an executor OOM, an interrupted job) propagates without
    * deleting a possibly-healthy artifact. Value drift under an
    * unchanged schema stays invisible to validation — that class still
    * requires the version-token bump (the mmaudit_v2 convention).
    */
  def servedArtifact(
      spark: SparkSession,
      path: String,
      expected: org.apache.spark.sql.types.StructType)(prime: => Unit): DataFrame = {
    if (!artifactExists(spark, path)) prime
    try readStamped(spark, path, expected)
    catch {
      case drift @ (_: ArtifactDriftException |
                    _: org.apache.spark.sql.AnalysisException) =>
        System.err.println(s"[graft] stale/foreign artifact at $path — " +
          s"re-priming (${drift.getMessage.take(200)})")
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        prime
        readStamped(spark, path, expected)
    }
  }

  /** Stable tmpdir path for a content-keyed persisted artifact — THE
    * convention every stored artifact in this library shares (band
    * indexes, component maps, bloom sketches, posting indexes, click
    * graphs): the digest covers the caller's scheme/params `key` PLUS a
    * footer-derived fingerprint (row count + uncompressed bytes of
    * `column`) of the source table, so a regenerated table misses the
    * stale artifact; `tag` names the file for humans. Callers append
    * their own extension/subdirs.
    */
  def contentKeyedArtifactPath(
      spark: SparkSession,
      dataPath: String,
      column: String,
      tag: String,
      key: String): String = {
    val fingerprint = s"${parquetRowCount(spark, dataPath)}:" +
      s"${parquetColumnUncompressedBytes(spark, dataPath, column)}"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key|$fingerprint".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_$digest"
  }
}
