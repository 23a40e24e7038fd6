package graft.io

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Hadoop Configuration is not Serializable; the standard write/read
  * fields dance, so the driver's FS settings (not a blank default)
  * reach the executors' readers. */
private[io] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** S1 as a REAL DataSource V2 format (SURVEY §2.1): the dependency-free
  * .xlsx parser ([[Xlsx]]) behind Spark's connector API, so
  *
  * {{{ spark.read.format("graft-xlsx").load(dir) }}}
  *
  * works for any session — including SQL-only users via
  * `CREATE TABLE ... USING "graft-xlsx"` — instead of a library entry
  * point. Schema = the header row of the lexicographically first file
  * (all string, the bounded driver-side header probe [[Sources]] uses
  * everywhere); options: `sheet` (1-based, default 1).
  *
  * Scale shape: one input partition per FILE (spreadsheets are
  * metadata-sized; a single .xlsx is not splittable — the sheet XML is
  * one zip entry), so a directory of N sheets parses with N-way
  * parallelism. Column pruning is honored at the reader
  * (`SupportsPushDownRequiredColumns`): only required cells become
  * UTF8Strings/rows — the XML must still be walked (row-major format),
  * so pruning saves row width and allocation, not parse CPU; a pushed
  * LIMIT (`SupportsPushDownLimit`) stops each file's parse after the
  * first `limit` data rows. */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = XlsxSource.listFiles(options)
    require(files.nonEmpty, s"no .xlsx files at ${options.get("path")}")
    val sheet = Option(options.get("sheet")).map(_.toInt).getOrElse(1)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val header = Xlsx.parseWorkbook(
        XlsxSource.readBytes(files.head, conf), sheet)
      .headOption.getOrElse(Seq.empty).map(_.trim)
    require(header.nonEmpty, s"no header row in ${files.head}")
    StructType(header.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XlsxTable(schema,
      new CaseInsensitiveStringMap(properties))
}

private[io] object XlsxSource {
  def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx: a path is required"))
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(raw)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val expanded = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }
    expanded.filter(st => st.isFile && st.getPath.getName.endsWith(".xlsx"))
      .map(_.getPath.toString).sorted
  }

  def readBytes(file: String, conf: Configuration): Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}

private[io] class XlsxTable(schema: StructType,
    options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-xlsx:${options.get("path")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap)
      : ScanBuilder =
    new XlsxScanBuilder(schema, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new XlsxWriteBuilder(info.schema(),
      Option(options.get("path")).getOrElse(info.options().get("path")))
}

/** Write side of the connector (S13, the sheet-export sink, through
  * `df.write.format("graft-xlsx")`): each non-empty input partition
  * writes its own `part-*.xlsx` carrying the header row — the CSV
  * part-file convention, so the read side's per-file header drop
  * round-trips it. All values are written as strings (cast upstream;
  * spreadsheets are a string-typed interchange format here, exactly
  * like [[Xlsx.writeXlsx]]). Overwrite = truncate: existing .xlsx in
  * the target are removed on the driver BEFORE tasks launch — a
  * best-effort directory sink, not a transactional one (that's
  * [[SnapshotTable]]'s job). */
private[io] class XlsxWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val conf = SparkSession.active.sessionState.newHadoopConf()
      if (doTruncate) {
        val p = new Path(path)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p))
          fs.listStatus(p).filter(_.getPath.getName.endsWith(".xlsx"))
            .foreach(st => fs.delete(st.getPath, false))
      }
      new XlsxBatchWrite(schema, path, new SerializableHadoopConf(conf))
    }
  }
}

private[io] class XlsxBatchWrite(schema: StructType, path: String,
    conf: SerializableHadoopConf) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new XlsxWriterFactory(schema, path, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[io] case class XlsxCommit(file: String) extends WriterCommitMessage

private[io] class XlsxWriterFactory(schema: StructType, path: String,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val header = schema.fieldNames.toSeq
      private val buf = scala.collection.mutable.ArrayBuffer[Seq[String]](header)
      override def write(record: InternalRow): Unit =
        buf += schema.fields.indices.map { i =>
          if (record.isNullAt(i)) null
          else record.get(i, schema.fields(i).dataType).toString
        }
      override def commit(): WriterCommitMessage = {
        if (buf.size > 1) {
          val tmp = java.io.File.createTempFile("graft_xlsx", ".xlsx")
          try {
            Xlsx.writeXlsx(tmp, buf.toSeq)
            val target = new Path(path,
              f"part-$partitionId%05d-$taskId.xlsx")
            val fs = target.getFileSystem(conf.value)
            val out = fs.create(target, true)
            try java.nio.file.Files.copy(tmp.toPath, out) finally out.close()
            XlsxCommit(target.toString)
          } finally { tmp.delete(); () }
        } else XlsxCommit("")
      }
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private[io] class XlsxScanBuilder(fullSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
  private var required: StructType = fullSchema
  private var limit: Int = -1
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // string equality and null checks evaluate on the raw cells inside
  // the reader — rows die before becoming InternalRows. Everything
  // else stays a post-scan filter (returned as "not pushed").
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(_, _: String) => true
      case IsNotNull(_) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new XlsxScan(fullSchema, required, options, limit, pushed)
}

private[io] case class XlsxInputPartition(file: String) extends InputPartition

private[io] class XlsxScan(fullSchema: StructType, required: StructType,
    options: CaseInsensitiveStringMap, limit: Int,
    filters: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val lim = if (limit >= 0) s", PushedLimit: $limit" else ""
    val f = if (filters.nonEmpty) s", PushedFilters: [${filters.mkString(", ")}]" else ""
    s"graft-xlsx ReadSchema: ${required.simpleString}$lim$f"
  }
  override def planInputPartitions(): Array[InputPartition] =
    XlsxSource.listFiles(options)
      .map(XlsxInputPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val sheet = Option(options.get("sheet")).map(_.toInt).getOrElse(1)
    // serializable (column index, required value | null=IsNotNull) pairs
    val cellFilters: Array[(Int, String)] = filters.collect {
      case org.apache.spark.sql.sources.EqualTo(c, v: String) =>
        fullSchema.fieldNames.indexOf(c) -> v
      case org.apache.spark.sql.sources.IsNotNull(c) =>
        fullSchema.fieldNames.indexOf(c) -> null
    }.filter(_._1 >= 0)
    new XlsxReaderFactory(
      fullSchema.fieldNames, required.fieldNames, sheet, limit, cellFilters,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))
  }
}

private[io] class XlsxReaderFactory(fullHeader: Array[String],
    requiredCols: Array[String], sheet: Int, limit: Int,
    cellFilters: Array[(Int, String)],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[XlsxInputPartition].file
    // required column -> position in the file's (header-ordered) cells
    val idx = requiredCols.map(c => fullHeader.indexOf(c))
    new PartitionReader[InternalRow] {
      private def cell(cells: Seq[String], i: Int): String = {
        val v = if (i >= 0 && i < cells.length) cells(i) else null
        if (v == null || v.isEmpty) null else v
      }
      private val rows: Iterator[Seq[String]] = {
        // filters run on raw cells BEFORE the pushed limit counts
        // (the limit is only pushed above fully-consumed operators,
        // but order here must not depend on that)
        val all = Xlsx.parseWorkbook(
            XlsxSource.readBytes(file, conf.value), sheet).iterator.drop(1)
          .filter(cells => cellFilters.forall { case (i, want) =>
            val v = cell(cells, i)
            if (want == null) v != null else v == want
          })
        if (limit >= 0) all.take(limit) else all
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!rows.hasNext) false
        else {
          val cells = rows.next()
          current = InternalRow.fromSeq(idx.toIndexedSeq.map { i =>
            val v = cell(cells, i)
            if (v == null) null else UTF8String.fromString(v)
          })
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
