package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CleaningFunctions._
import graft.ops.Pairing

/** Artifact generation (SURVEY §3.3 — create_sheets.py): workflow CSV,
  * SRA TSV, biosample TSV, sharing one pre-paired scan per project.
  * This is the §7.3 minimum end-to-end slice, generalized.
  */
object CreateSheets {

  /** Pre-processing shared by workflow/SRA sheets
    * (create_sheets.py:20-64): pair the files fuzzily per sample. */
  def prePaired(samples: DataFrame): DataFrame =
    Pairing.pairFuzzy(
      samples.withColumnRenamed("*sample_name", "sample_name")
        .withColumnRenamed("*organism", "organism"))
      .join(samples
          .withColumnRenamed("*sample_name", "sample_name")
          .withColumnRenamed("*organism", "organism")
          .drop("files"),
        Seq("sample_name", "organism"))

  /** Workflow sheet (create_sheets.py:67-124): select/rename, placeholder
    * substitution, quote-strip + trim on coordinates, Run/BioProject
    * copies, dropDuplicates. */
  def workflowSheet(samples: DataFrame, projectId: String): DataFrame = {
    val paired = prePaired(samples.where(col("ccgp_project_id") === projectId))
    paired
      .withColumn("ref_genome_accession", refGenomePlaceholder(col("ref_genome_accession")))
      .withColumn("lat", dequote(col("lat").cast("string")))
      .withColumn("long", dequote(col("long").cast("string")))
      .select(
        col("sample_name").as("BioSample"),
        col("library_ID").as("LibraryName"),
        col("ref_genome_accession").as("refGenome"),
        col("filename").as("fq1"),
        col("filename2").as("fq2"),
        col("lat"), col("long"),
        col("ccgp_project_id").as("Organism"))
      .withColumn("Run", col("LibraryName"))
      .withColumn("BioProject", col("Organism"))
      .dropDuplicates()
  }

  /** SRA sheet (create_sheets.py:130-168): constant fills + fixed column
    * order. */
  def sraSheet(samples: DataFrame, projectId: String): DataFrame = {
    val paired = prePaired(samples.where(col("ccgp_project_id") === projectId))
    val filled = fillDefaults(
      paired.withColumnRenamed("library_prep_method", "design_description"),
      sraDefaults)
    filled.select(
      col("sample_name"), col("library_ID"), col("title"),
      col("library_strategy"), col("library_source"), col("library_selection"),
      col("library_layout"), col("platform"), col("instrument_model"),
      col("design_description"), col("filetype"),
      col("filename"), col("filename2"))
  }

  /** NCBI BioSample taxon column whitelists (create_sheets.py:194-299):
    * the engine keeps the intersection with whatever columns the project
    * actually has (P1/U3 schema intersection). */
  val plantCols: Seq[String] = Seq(
    "sample_name", "sample_title", "bioproject_accession", "organism",
    "isolate", "cultivar", "ecotype", "age", "*gen_loc_name", "*tissue",
    "biomaterial_provider", "cell_line", "cell_type", "collected_by",
    "collection_date", "culture_collection", "disease", "disease_stage",
    "genotype", "growth_protocol", "isolation_source", "lat_lon",
    "phenotype", "population", "sample_type", "sex", "specimen_voucher",
    "temp", "treatment", "description", "design_description")
  val invertebrateCols: Seq[String] = Seq(
    "sample_name", "sample_title", "bioproject_accession", "organism",
    "isolate", "breed", "host", "isolation_source", "*collection_date",
    "*geo_loc_name", "*tissue", "age", "altitude", "biomaterial_provider",
    "collected_by", "depth", "dev_stage", "env_broad_scale",
    "host_tissue_sampled", "identified_by", "lat_lon", "sex",
    "specimen_voucher", "temp", "description", "design_description")
  val vertebrateCols: Seq[String] = Seq(
    "sample_name", "sample_title", "bioproject_accession", "organism",
    "strain", "isolate", "breed", "cultivar", "ecotype", "age", "dev_stage",
    "*sex", "*tissue", "biomaterial_provider", "birth_date",
    "birth_location", "breeding_history", "breeding_method", "cell_line",
    "cell_subtype", "cell_type", "collected_by", "collection_date",
    "culture_collection", "death_date", "disease", "disease_stage",
    "genotype", "geo_loc_name", "growth_protocol", "health_state",
    "isolation_source", "lat_lon", "phenotype", "sample_type",
    "specimen_voucher", "store_cond", "stud_book_number", "treatment",
    "description", "design_description")

  /** Taxon → whitelist dispatch (gsheets.py:41-45 `NCBI Template`). */
  def taxonCols(taxon: String): Seq[String] = taxon match {
    case "Plant"        => plantCols
    case "Invertebrate" => invertebrateCols
    case _              => vertebrateCols
  }

  /** Biosample sheet core (create_sheets.py:171-311): lat_lon compose,
    * isolate uniquifier, empty bioproject accession, taxon column
    * whitelist intersection. */
  def biosampleSheet(samples: DataFrame, projectId: String,
      taxonCols: Seq[String]): DataFrame = {
    val df = samples.where(col("ccgp_project_id") === projectId)
      .withColumnRenamed("*sample_name", "sample_name")
      .withColumnRenamed("*organism", "organism")
      .withColumnRenamed("library_prep_method", "design_description")
      .withColumn("lat_lon",
        latLonCompose(col("lat"), col("long")))
      .withColumn("isolate", isolate(col("organism"), col("sample_name")))
      .withColumn("bioproject_accession", lit(""))
    val keep = (Seq("sample_name", "bioproject_accession", "organism",
      "isolate", "lat_lon", "design_description") ++ taxonCols)
      .distinct.filter(df.columns.contains)
    df.select(keep.map(c => col(s"`$c`")): _*)
  }

  /** workflow_progress stamp (create_sheets.py:120-124): upsert one
    * event-timestamp column for the project. */
  def progressStamp(progress: DataFrame, projectId: String, eventCol: String,
      now: java.sql.Timestamp): DataFrame = {
    val spark = progress.sparkSession
    val update = spark.createDataFrame(Seq((projectId, now)))
      .toDF("project_id", eventCol)
    graft.ops.Upsert.merge(progress, update, Seq("project_id"))
  }
}
