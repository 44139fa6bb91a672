package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming source abstraction (SURVEY S16 / §7 hard-part 6): downstream
  * plans take a DataFrame, so production Kafka and test sources are
  * interchangeable — the Kafka jar's absence in this environment changes
  * configuration, not the query.
  */
object SourceFactory {

  sealed trait SourceSpec
  /** Kafka topic (requires spark-sql-kafka on the classpath at runtime;
    * same options the reference uses — spark_kafka_foreachbatch.py:31-37).
    */
  final case class Kafka(bootstrap: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Long = 100) extends SourceSpec
  /** TCP socket (lab06 socket_streaming.py:11-16). */
  final case class Socket(host: String, port: Int) extends SourceSpec
  /** File-arrival directory stream (lab05 ingest). */
  final case class Dir(path: String, schema: StructType,
      maxFilesPerTrigger: Int = 10, format: String = "parquet") extends SourceSpec

  /** Build the streaming DataFrame for a spec. Kafka yields the standard
    * (key, value, topic, partition, offset, timestamp, …) columns;
    * Socket yields (value); Dir yields the supplied schema.
    */
  def open(spark: SparkSession, spec: SourceSpec): DataFrame = spec match {
    case Kafka(bootstrap, topic, offsets, maxPerTrigger) =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", offsets)
        .option("maxOffsetsPerTrigger", maxPerTrigger)
        .load()
    case Socket(host, port) =>
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
    case Dir(path, schema, maxFiles, fmt) =>
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFiles)
        .format(fmt).load(path)
  }
}
