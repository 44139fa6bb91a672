package graft

import graft.streaming.{KafkaWire, SourceFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Contract tests for the two environment-blocked sources (S16 Kafka,
  * S14 HDFS): everything short of a live broker/namenode is exercised —
  * the public RecordBatch wire format round-trips through the real
  * codec, and hdfs:// URI routing resolves through the real Hadoop
  * client classes that ship with Spark.
  */
class KafkaHdfsContractSpec extends SparkTestBase {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("Kafka RecordBatch v2 round-trips: offsets, timestamps, null keys") {
    val batch = KafkaWire.encodeBatch(baseOffset = 42L, baseTimestamp = 1000L,
      records = Seq(
        (1000L, b("k1"), b("v1")),
        (1007L, null, b("v2")),
        (1009L, b("k3"), null)))
    val recs = KafkaWire.decodeBatch(batch)
    assert(recs.map(_.offset) === Seq(42L, 43L, 44L))
    assert(recs.map(_.timestamp) === Seq(1000L, 1007L, 1009L))
    assert(new String(recs(0).key, "UTF-8") === "k1")
    assert(recs(1).key === null)
    assert(new String(recs(1).value, "UTF-8") === "v2")
    assert(recs(2).value === null)
  }

  test("Kafka decode validates CRC32C — corruption fails loudly") {
    val batch = KafkaWire.encodeBatch(0L, 0L, Seq((0L, b("k"), b("v"))))
    val corrupt = batch.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    val ex = intercept[IllegalArgumentException] {
      KafkaWire.decodeBatch(corrupt)
    }
    assert(ex.getMessage.contains("CRC"))
  }

  test("Kafka decode refuses compressed batches instead of guessing") {
    val batch = KafkaWire.encodeBatch(0L, 0L, Seq((0L, b("k"), b("v"))))
    // set codec bits in `attributes` (offset 21) and re-seal the CRC so
    // only the compression check can fire
    val patched = batch.clone()
    patched(22) = (patched(22) | 0x02).toByte // attributes little bits are byte 22 (big-endian short at 21)
    val crc = new java.util.zip.CRC32C()
    crc.update(patched, 21, patched.length - 21)
    val c = crc.getValue.toInt
    patched(17) = (c >> 24).toByte; patched(18) = (c >> 16).toByte
    patched(19) = (c >> 8).toByte; patched(20) = c.toByte
    val ex = intercept[IllegalArgumentException] {
      KafkaWire.decodeBatch(patched)
    }
    assert(ex.getMessage.contains("compressed"))
  }

  test("Kafka segment scan: binary batches explode to records in Spark") {
    import spark.implicits._
    val batches = (0 until 4).map { p =>
      KafkaWire.encodeBatch(p * 100L, 5000L + p,
        (0 until 25).map(i => (5000L + p + i, b(s"k$p-$i"), b(s"v$p-$i"))))
    }
    val ds = spark.createDataset(batches)(org.apache.spark.sql.Encoders.BINARY)
      .repartition(4)
    val recs = KafkaWire.records(ds)
    assert(recs.count() === 100)
    val offsets = recs.map(_.offset).collect().sorted
    assert(offsets.take(25).toSeq === (0L until 25L).toSeq)
    assert(offsets.takeRight(25).toSeq === (300L until 325L).toSeq)
  }

  test("S16 contract: SourceFactory wires kafka options; env lacks the jar") {
    val ex = intercept[Exception] {
      SourceFactory.open(spark,
        SourceFactory.Kafka("broker:9092", "events", "earliest", 50))
    }
    // the factory reached Spark's source resolution with format "kafka" —
    // the jar, not the wiring, is what's missing in this sandbox
    assert(ex.getMessage.toLowerCase.contains("kafka"), ex.getMessage)
  }

  test("S14 contract: hdfs:// URIs route and qualify through the real client") {
    val conf = new Configuration()
    conf.set("fs.defaultFS", "hdfs://namenode.example:9000")
    // relative/bare paths qualify against the configured namenode
    val q = new Path("/warehouse/t1")
      .makeQualified(FileSystem.getDefaultUri(conf), new Path("/"))
    assert(q.toString === "hdfs://namenode.example:9000/warehouse/t1")
    // the hdfs scheme resolves to the real DistributedFileSystem class
    // shipped in Spark's hadoop-client jars — wiring, minus a namenode
    val cls = FileSystem.getFileSystemClass("hdfs", conf)
    assert(cls.getName === "org.apache.hadoop.hdfs.DistributedFileSystem")
  }

  test("S14: Sessions.withDefaultFs pins fs.defaultFS on the live session") {
    val hc = spark.sparkContext.hadoopConfiguration
    val saved = hc.get("fs.defaultFS")
    try {
      Sessions.withDefaultFs(spark, "hdfs://namenode.example:9000")
      assert(hc.get("fs.defaultFS") === "hdfs://namenode.example:9000")
    } finally hc.set("fs.defaultFS", saved)
  }
}
