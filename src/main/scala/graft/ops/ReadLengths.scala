package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Listing

/** Read-length ingestion (`/root/reference/update_readlength_mongo.py:14-30`
  * and the pyfastx path): populate `sequence_length` on the `reads` table.
  *
  * Two producers:
  *  - [[fromFastqHeads]] — parse the length from the fastq files
  *    themselves. Listing is the metadata-only binaryFile scan; each task
  *    then opens ITS OWN files and streams just the first record through a
  *    decompressor — never loading a whole (potentially multi-GB) fastq
  *    into memory, unlike a binaryFile `content` read. Distributed,
  *    head-bytes-only I/O.
  *  - [[fromStatsCsv]] — the reference cron's actual input: a
  *    FastQC/MultiQC general-stats CSV keyed by Sample.
  *
  * [[updateReads]] then `$set`-merges into `reads` on `file_name` and
  * reports per-file matched/missing status (the reference's log lines).
  */
object ReadLengths {

  /** First fastq record's sequence length per file. `headBytes` bounds
    * the read (a fastq record is 4 short lines; 64 KiB is generous). */
  def fromFastqHeads(spark: SparkSession, dir: String,
      glob: String = "*.fastq*", headBytes: Int = 65536): DataFrame = {
    import spark.implicits._
    val paths = Listing.listFiles(spark, dir, glob)
      .select(col("file_name"), col("path")).as[(String, String)]
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    paths.mapPartitions { it =>
      val conf = confBc.value.value
      it.map { case (name, path) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val raw = fs.open(p)
        try {
          val in: java.io.InputStream =
            if (name.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
            else raw
          val head = new Array[Byte](headBytes)
          var off = 0
          var n = 0
          while (off < headBytes && { n = in.read(head, off, headBytes - off); n > 0 })
            off += n
          val lines = new String(head, 0, off, java.nio.charset.StandardCharsets.US_ASCII)
            .split("\n", -1)
          // record = @id / sequence / + / quality; length of line 2
          val len = if (lines.length >= 2 && lines(0).startsWith("@"))
            lines(1).trim.length.toLong else -1L
          (name, len)
        } finally raw.close()
      }
    }.toDF("file_name", "sequence_length")
  }

  /** FastQC/MultiQC general-stats CSV → (file_name, sequence_length);
    * file_name = Sample + ".fastq.gz" (update_readlength_mongo.py:15-18). */
  def fromStatsCsv(spark: SparkSession, path: String,
      lengthCol: String = "FastQC_mqc-generalstats-fastqc-total_sequences"): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(concat(col("Sample"), lit(".fastq.gz")).as("file_name"),
        col(s"`$lengthCol`").cast("long").as("sequence_length"))

  /** `$set` sequence_length into `reads` on file_name. Returns
    * (updated reads, ledger(file_name, status ∈ matched|missing)) — the
    * ledger mirrors the reference's found/missing log. Lengths for files
    * absent from `reads` are logged, NOT inserted (update_one semantics:
    * matched_count == 0 means no write). */
  def updateReads(reads: DataFrame, lengths: DataFrame): (DataFrame, DataFrame) = {
    val l = lengths.select(col("file_name"),
      col("sequence_length").as("_new_len"))
    val existing =
      if (reads.columns.contains("sequence_length")) col("sequence_length")
      else lit(null).cast("long")
    val updated = reads.join(l, Seq("file_name"), "left")
      .withColumn("sequence_length", coalesce(col("_new_len"), existing))
      .drop("_new_len")
    val ledger = l.join(reads.select(col("file_name"), lit(true).as("_hit")),
        Seq("file_name"), "left")
      .select(col("file_name"),
        when(col("_hit"), "matched").otherwise("missing").as("status"))
    (updated, ledger)
  }
}
