package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 digest-index store ("GDX") — the connector tier the
  * engine's dedup/index workflows want AND the two DSv2 capabilities the
  * NbuRawSource doesn't exercise:
  *
  *  - **Transactional writes** (`SupportsWrite`): tasks write
  *    `part-*.tmp` files; only the driver-side `BatchWrite.commit`
  *    publishes them, by writing a `_manifest` that LISTS the committed
  *    files. Readers plan exclusively from the manifest, so a crashed or
  *    aborted job (stray tmp files, half-written data) is invisible —
  *    the object-store-safe commit pattern (the commit point is ONE
  *    manifest PUT; correctness never depends on rename atomicity,
  *    which S3-style stores don't provide).
  *  - **Filter pushdown** (`SupportsPushDownFilters`): k-range and
  *    k/v-equality predicates are evaluated INSIDE the partition reader
  *    (rows never materialize), and remain in `pushedFilters` so the
  *    plan shows them; unsupported predicates stay post-scan.
  *
  * All I/O goes through the Hadoop `FileSystem` resolved from the path
  * (the Maintenance/TableSwap discipline), so the same connector runs on
  * file://, hdfs://, and object stores; executor-side tasks carry the
  * driver's Hadoop configuration via [[SerializableHadoopConf]].
  *
  * Schema is fixed: (k BIGINT, v STRING) — a digest index (doc_id,
  * digest) or any key-value landing. Encoding is tab-separated lines;
  * the point here is the PROTOCOL (manifest commit, pushdown), not the
  * byte format. One input partition per committed file.
  *
  * Usage:
  *   df.write.format("graft.sources.GdxSource").option("path", dir)
  *     .mode("append").save()   // commit publishes the manifest
  *   spark.read.format("graft.sources.GdxSource").option("path", dir)
  *     .load().filter(...)
  */
class GdxSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GdxSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GdxTable(properties.get("path"))
}

/** Hadoop Configuration is not Serializable; ship it to executors via
  * its own wire format (the standard Spark-internal trick, re-done here
  * in public API only). */
class SerializableHadoopConf(@transient var conf: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

object GdxSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  /** Driver-side Hadoop conf (active session's, else defaults). */
  def driverConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def manifest(path: String) = new Path(path, "_manifest")

  /** Files the manifest has published (empty if never committed). */
  def committedFiles(path: String, conf: Configuration): Seq[Path] = {
    val m = manifest(path)
    val fs = m.getFileSystem(conf)
    if (!fs.exists(m)) Seq.empty
    else {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(m), "UTF-8"))
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty).map(new Path(path, _)).toList
      finally in.close()
    }
  }
}

class GdxTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"gdx($path)"
  override def schema(): StructType = GdxSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GdxScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GdxWriteBuilder(path)
}

// ---------------------------------------------------------------- read

class GdxScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{
    Aggregation, CountStar, Max, Min}

  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggOps: Option[Seq[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("k", _: Number)            => true
      case GreaterThan("k", _: Number)        => true
      case GreaterThanOrEqual("k", _: Number) => true
      case LessThan("k", _: Number)           => true
      case LessThanOrEqual("k", _: Number)    => true
      case EqualTo("v", _: String)            => true
      // k/v are never NULL in this format (every line parses both), so
      // derived IsNotNull guards are trivially satisfied reader-side —
      // accepting them keeps the post-scan filter EMPTY, which is the
      // precondition for aggregate pushdown
      case IsNotNull("k") | IsNotNull("v")    => true
      case _                                  => false
    }
    pushed = supported
    residual // Spark re-checks residuals post-scan; pushed ones it trusts
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT reaches the reader as a per-partition row cap; Spark still
    * applies the global limit (isPartiallyPushed), but each file stops
    * reading after `n` surviving rows instead of draining. */
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed(): Boolean = true

  /** Ungrouped COUNT(*) / MIN(k) / MAX(k) collapse to ONE partial row
    * per file — the scan moves per-file statistics, not data; Spark
    * runs the final merge (partial pushdown, not complete). */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions().nonEmpty) return false
    def isK(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference => r.fieldNames().toSeq == Seq("k")
        case _                 => false
      }
    val ops = agg.aggregateExpressions().map {
      case _: CountStar            => "count"
      case m: Min if isK(m.column) => "min"
      case m: Max if isK(m.column) => "max"
      case _                       => return false
    }
    aggOps = Some(ops.toSeq)
    true
  }

  override def build(): Scan = new GdxScan(path, pushed, limit, aggOps)
}

case class GdxFilePartition(file: String) extends InputPartition

class GdxScan(path: String, pushed: Array[Filter], limit: Int,
              aggOps: Option[Seq[String]]) extends Scan with Batch {
  override def readSchema(): StructType = aggOps match {
    case Some(ops) => StructType(ops.zipWithIndex.map { case (op, i) =>
      StructField(s"${op}_$i", LongType, nullable = op != "count")
    })
    case None => GdxSource.schema
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"GdxScan pushed=[${pushed.mkString(", ")}]" +
      (if (limit >= 0) s" limit=$limit" else "") +
      aggOps.map(o => s" agg=[${o.mkString(", ")}]").getOrElse("")

  // plan ONLY manifest-published files — stray tmp/uncommitted data is
  // invisible by construction
  override def planInputPartitions(): Array[InputPartition] =
    GdxSource.committedFiles(path, GdxSource.driverConf())
      .sortBy(_.toString)
      .map(f => GdxFilePartition(f.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GdxReaderFactory(pushed, limit, aggOps,
      new SerializableHadoopConf(GdxSource.driverConf()))
}

class GdxReaderFactory(pushed: Array[Filter], limit: Int,
                       aggOps: Option[Seq[String]],
                       conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val base = new GdxFileReader(
      p.asInstanceOf[GdxFilePartition].file, pushed, limit, conf)
    aggOps match {
      case Some(ops) => new GdxAggReader(base, ops)
      case None      => base
    }
  }
}

/** Line reader applying the pushed predicates before materializing and
  * honoring a pushed per-partition limit. */
class GdxFileReader(file: String, pushed: Array[Filter], limit: Int,
                    conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val p = new Path(file)
  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    p.getFileSystem(conf.conf).open(p), "UTF-8"))
  private var row: InternalRow = _
  private var emitted = 0L
  var lastK: Long = _
  var lastV: String = _

  private def keep(k: Long, v: String): Boolean = pushed.forall {
    case EqualTo("k", want: Number)         => k == want.longValue
    case GreaterThan("k", b: Number)        => k > b.longValue
    case GreaterThanOrEqual("k", b: Number) => k >= b.longValue
    case LessThan("k", b: Number)           => k < b.longValue
    case LessThanOrEqual("k", b: Number)    => k <= b.longValue
    case EqualTo("v", want: String)         => v == want
    case IsNotNull(_)                       => true
    case _                                  => true
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    var line = in.readLine()
    while (line != null) {
      val tab = line.indexOf('\t')
      if (tab > 0) {
        val k = line.substring(0, tab).toLong
        val v = line.substring(tab + 1)
        if (keep(k, v)) {
          lastK = k; lastV = v
          row = InternalRow(k, UTF8String.fromString(v))
          emitted += 1
          return true
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Folds the (filtered) file stream into one partial-aggregate row —
  * count/min/max per file; Spark's final aggregate merges the files. */
class GdxAggReader(base: GdxFileReader, ops: Seq[String])
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    var n = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    while (base.next()) {
      n += 1
      if (base.lastK < mn) mn = base.lastK
      if (base.lastK > mx) mx = base.lastK
    }
    row = InternalRow.fromSeq(ops.map {
      case "count" => n
      case "min"   => if (n == 0) null else mn
      case "max"   => if (n == 0) null else mx
    })
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = base.close()
}

// --------------------------------------------------------------- write

class GdxWriteBuilder(path: String)
    extends WriteBuilder with SupportsTruncate {
  // manifest visibility makes truncate free: every commit REPLACES the
  // published file set, so overwrite == append + manifest swap; old
  // files are orphaned (invisible) and reclaimable by compaction
  override def truncate(): WriteBuilder = this
  override def build(): Write = new GdxWrite(path)
}

class GdxWrite(path: String) extends Write {
  override def toBatch: BatchWrite = new GdxBatchWrite(path)
}

case class GdxCommitMessage(tmpName: String) extends WriterCommitMessage

class GdxBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new GdxWriterFactory(path,
    new SerializableHadoopConf(GdxSource.driverConf()))

  /** Driver-side publish: rename each task's tmp file to its final name
    * and write the manifest LAST — readers only ever see the manifest's
    * list, so the commit point is the single manifest write (renames
    * are tidiness, not the correctness boundary). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = GdxSource.driverConf()
    val base = new Path(path)
    val fs = base.getFileSystem(conf)
    val finals = messages.collect { case GdxCommitMessage(tmp) =>
      val fin = tmp.stripSuffix(".tmp")
      val dst = new Path(base, fin)
      // a prior commit's same-named file is orphaned data (visibility is
      // manifest-only) — clear it; Hadoop rename never overwrites
      if (fs.exists(dst)) fs.delete(dst, false)
      val ok = fs.rename(new Path(base, tmp), dst)
      require(ok, s"gdx commit: rename $tmp -> $fin failed")
      fin
    }
    val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      fs.create(GdxSource.manifest(path), true), "UTF-8"))
    try finals.sorted.foreach(out.println) finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = GdxSource.driverConf()
    val base = new Path(path)
    val fs = base.getFileSystem(conf)
    messages.collect { case GdxCommitMessage(tmp) =>
      fs.delete(new Path(base, tmp), false)
    }
  }
}

class GdxWriterFactory(path: String, conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GdxDataWriter(path, partitionId, taskId, conf)
}

/** Task-side writer: data lands in a uniquely-named `.tmp` file that
  * only the driver commit publishes; a speculative duplicate or failed
  * attempt leaves at most an unreferenced tmp (cleaned by abort, and
  * harmless if leaked — readers never list the directory). */
class GdxDataWriter(path: String, partitionId: Int, taskId: Long,
                    conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {
  private val name = f"part-$partitionId%05d-$taskId.gdx.tmp"
  private val target = new Path(path, name)
  private val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
    target.getFileSystem(conf.conf).create(target, true), "UTF-8"))

  override def write(r: InternalRow): Unit = {
    out.print(r.getLong(0)); out.print('\t')
    out.println(r.getUTF8String(1).toString)
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    GdxCommitMessage(name)
  }
  override def abort(): Unit = {
    out.close()
    target.getFileSystem(conf.conf).delete(target, false); ()
  }
  override def close(): Unit = out.close()
}
