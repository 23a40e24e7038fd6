package graft

import java.nio.file.Files
import graft.ops.ReadLengths

/** Read-length ingestion (update_readlength_mongo.py:14-30 and the
  * pyfastx head-parse path): fastq head scan, stats-CSV parse, and the
  * $set merge with matched/missing ledger. */
class ReadLengthsSpec extends SparkSpec {

  import spark.implicits._

  private def writeGz(path: java.nio.file.Path, content: String): Unit = {
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(path))
    try out.write(content.getBytes("US-ASCII")) finally out.close()
  }

  test("fastq head scan: plain + gzipped first-record lengths, bad file flagged") {
    val dir = Files.createTempDirectory("graft-fastq")
    Files.writeString(dir.resolve("a_R1.fastq"),
      "@r1 desc\nACGTACGT\n+\nIIIIIIII\n@r2\nAC\n+\nII\n")
    writeGz(dir.resolve("b_R1.fastq.gz"),
      "@read/1\nACGTACGTACGT\n+\nIIIIIIIIIIII\n")
    Files.writeString(dir.resolve("junk.fastq"), "not a fastq at all\n")

    val out = ReadLengths.fromFastqHeads(spark, dir.toString)
      .collect().map(r => r.getAs[String]("file_name") ->
        r.getAs[Long]("sequence_length")).toMap
    assert(out("a_R1.fastq") === 8L)       // first record only
    assert(out("b_R1.fastq.gz") === 12L)   // through the gzip stream
    assert(out("junk.fastq") === -1L)      // no @ header -> flagged
  }

  test("stats CSV parse: Sample -> file_name key, length column cast") {
    val f = Files.createTempFile("graft-stats", ".csv")
    Files.writeString(f,
      "Sample,FastQC_mqc-generalstats-fastqc-total_sequences\n" +
        "CC131_SelS_S1_L001_R1_001,1500000\nAB-1_R1,42\n")
    val out = ReadLengths.fromStatsCsv(spark, f.toString)
      .collect().map(r => r.getAs[String]("file_name") ->
        r.getAs[Long]("sequence_length")).toMap
    assert(out === Map(
      "CC131_SelS_S1_L001_R1_001.fastq.gz" -> 1500000L,
      "AB-1_R1.fastq.gz" -> 42L))
  }

  test("updateReads: $set on match, existing kept when no length, missing ledgered not inserted") {
    val reads = Seq(
      ("f1.fastq.gz", Some(10L)),   // will be overwritten
      ("f2.fastq.gz", Some(20L)),   // no new length -> kept
      ("f3.fastq.gz", None))        // filled from null
      .map { case (n, l) => (n, l.map(Long.box).orNull) }
      .toDF("file_name", "sequence_length")
      .select($"file_name", $"sequence_length".cast("long"))
    val lengths = Seq(("f1.fastq.gz", 11L), ("f3.fastq.gz", 33L),
      ("ghost.fastq.gz", 99L)).toDF("file_name", "sequence_length")

    val (updated, ledger) = ReadLengths.updateReads(reads, lengths)
    val u = updated.collect().map(r => r.getAs[String]("file_name") ->
      Option(r.getAs[java.lang.Long]("sequence_length"))).toMap
    assert(u("f1.fastq.gz").contains(11L))
    assert(u("f2.fastq.gz").contains(20L))
    assert(u("f3.fastq.gz").contains(33L))
    assert(!u.contains("ghost.fastq.gz")) // update_one: never inserts

    val led = ledger.collect().map(r => r.getAs[String]("file_name") ->
      r.getAs[String]("status")).toMap
    assert(led === Map("f1.fastq.gz" -> "matched", "f3.fastq.gz" -> "matched",
      "ghost.fastq.gz" -> "missing"))
  }
}
