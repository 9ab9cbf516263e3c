package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's native ingestion surface: headerless CSV with an
  * explicitly declared schema per table — ClickHouse `ENGINE =
  * S3('<url>/<file>.tbl', 'CSV')` DDL (`/root/reference/README.md:158-221`)
  * re-expressed as `spark.read.schema(...).csv(path)`. Type mapping per
  * SURVEY.md §1.2: UInt32 → LongType (keys/money must widen), UInt8 →
  * IntegerType, LowCardinality(String) → StringType (dictionary encoding
  * is a storage property), Date → DateType.
  *
  * Paths may be local, `s3a://`, or any Hadoop-supported filesystem —
  * the same schema-on-read contract as the reference's S3 engine. CSV
  * scans are splittable (uncompressed/bzip2), so a 100 TB landing zone
  * parallelizes; the first transformation should snapshot to
  * parquet/bucketed tables (the reference's `sources` materialization
  * layer, `README.md:257-258`) — see [[graft.plans.Star.materialize]]
  * and [[graft.plans.Bucketed]].
  */
object SsbCsv {

  val customerSchema: StructType = StructType(Seq(
    StructField("C_CUSTKEY", LongType, nullable = false),
    StructField("C_NAME", StringType),
    StructField("C_ADDRESS", StringType),
    StructField("C_CITY", StringType),
    StructField("C_NATION", StringType),
    StructField("C_REGION", StringType),
    StructField("C_PHONE", StringType),
    StructField("C_MKTSEGMENT", StringType)))

  val lineorderSchema: StructType = StructType(Seq(
    StructField("LO_ORDERKEY", LongType, nullable = false),
    StructField("LO_LINENUMBER", IntegerType),
    StructField("LO_CUSTKEY", LongType),
    StructField("LO_PARTKEY", LongType),
    StructField("LO_SUPPKEY", LongType),
    StructField("LO_ORDERDATE", DateType),
    StructField("LO_ORDERPRIORITY", StringType),
    StructField("LO_SHIPPRIORITY", IntegerType),
    StructField("LO_QUANTITY", IntegerType),
    StructField("LO_EXTENDEDPRICE", LongType),
    StructField("LO_ORDTOTALPRICE", LongType),
    StructField("LO_DISCOUNT", IntegerType),
    StructField("LO_REVENUE", LongType),
    StructField("LO_SUPPLYCOST", LongType),
    StructField("LO_TAX", IntegerType),
    StructField("LO_COMMITDATE", DateType),
    StructField("LO_SHIPMODE", StringType)))

  val partSchema: StructType = StructType(Seq(
    StructField("P_PARTKEY", LongType, nullable = false),
    StructField("P_NAME", StringType),
    StructField("P_MFGR", StringType),
    StructField("P_CATEGORY", StringType),
    StructField("P_BRAND", StringType),
    StructField("P_COLOR", StringType),
    StructField("P_TYPE", StringType),
    StructField("P_SIZE", IntegerType),
    StructField("P_CONTAINER", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("S_SUPPKEY", LongType, nullable = false),
    StructField("S_NAME", StringType),
    StructField("S_ADDRESS", StringType),
    StructField("S_CITY", StringType),
    StructField("S_NATION", StringType),
    StructField("S_REGION", StringType),
    StructField("S_PHONE", StringType)))

  val schemas: Map[String, StructType] = Map(
    "customer" -> customerSchema, "lineorder" -> lineorderSchema,
    "part" -> partSchema, "supplier" -> supplierSchema)

  /** Schema-on-read scan of a `.tbl`/CSV file or directory. ssb-dbgen
    * emits `|`-delimited rows; plain CSV uses `,` — pass the delimiter
    * the files actually use. */
  def read(spark: SparkSession, table: String, path: String,
      delimiter: String = "|"): DataFrame =
    spark.read
      .schema(schemas(table))
      .option("header", "false")
      .option("sep", delimiter)
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
}
