package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: bit-interleave correctness and the actual payoff —
  * file-level min/max pruning on BOTH interleaved dimensions, measured
  * against a single-column-sorted layout of the same data.
  */
class LayoutSpec extends SparkSpec {

  test("bloomWrite: row-group bloom filters answer presence exactly, absence at a low FP rate — where min/max stats cannot prune at all") {
    implicit val s = spark
    import s.implicits._
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import scala.jdk.CollectionConverters._
    // shuffled high-cardinality keys: every file's [min, max] spans the
    // whole domain, so footer stats prune NOTHING for a point lookup
    val n = 4000
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val keys = spark.range(n.toLong)
      .select(concat(lit("pk-"), expr("xxhash64(id)")).as("pk"),
        col("id").as("v"))
    Layout.bloomWrite(keys, Seq("pk"), dir, nFiles = 4, expectedNdv = 1200)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 4)
    var present = 0
    var presentHits = 0
    var absentHits = 0
    val absentProbes = 500
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f),
          new Configuration()))
      try {
        val footer = reader.getFooter
        footer.getBlocks.asScala.foreach { block =>
          val colMeta = block.getColumns.asScala
            .find(_.getPath.toDotString == "pk").get
          // the filter was actually written
          assert(colMeta.getBloomFilterOffset > 0,
            s"no bloom filter in $f")
          val bloom = reader.getBloomFilterDataReader(block)
            .readBloomFilter(colMeta)
          // stats cannot prune: this row group's [min, max] brackets
          // essentially any probe (shuffled keys)
          // presence: every key IN this file must hit (no false negatives)
          val inFile = spark.read.parquet(f).select("pk")
            .collect().map(_.getString(0))
          inFile.take(200).foreach { k =>
            present += 1
            if (bloom.findHash(bloom.hash(Binary.fromString(k))))
              presentHits += 1
          }
          (0 until absentProbes).foreach { i =>
            if (bloom.findHash(bloom.hash(Binary.fromString(s"absent-$i"))))
              absentHits += 1
          }
        }
      } finally reader.close()
    }
    assert(present > 0 && presentHits == present,
      "bloom filters must never false-negative a present key")
    val fp = absentHits.toDouble / (absentProbes * files.length)
    assert(fp < 0.1, s"absent-key FP rate $fp — filter mis-sized")
  }

  test("zValue: hand-checked interleave, SQL twin identical, bounds") {
    implicit val s = spark
    import s.implicits._
    // a=0b101 (bits 0,2), b=0b011 (bits 0,1) →
    // z bits: a→{0,4}, b→{1,3} → 0b11011 = 27
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L), (1048575L, 1048575L))
      .toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b"), 20))
      .withColumn("zsql", expr(Layout.zValueSql("a", "b", 20)))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((5L, 3L)) == 27L)
    assert(rows((0L, 0L)) == 0L)
    assert(rows((7L, 0L)) == (1L | 4L | 16L))       // even bit positions
    assert(rows((0L, 7L)) == (2L | 8L | 32L))       // odd bit positions
    assert(rows((1048575L, 1048575L)) == (1L << 40) - 1) // all 40 bits set
    // the generated SQL is the same function
    assert(df.filter(col("z") =!= col("zsql")).count() == 0)
  }

  test("zorderWrite: BOTH dimensions prune files; single-column sort prunes only one") {
    implicit val s = spark
    import s.implicits._
    // synthetic uniform 2-D table: 64 x 64 grid, 4096 rows
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).cast("bigint").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-layout")
      .toString
    try {
      val nFiles = 16
      Layout.zorderWrite(df, col("a"), col("b"), bits = 6,
        s"$dir/z", nFiles)
      // the comparison layout: same file count, sorted on `a` only
      df.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
        .write.mode("overwrite").parquet(s"$dir/flat")

      // file-level min/max footprint of a point-range predicate: how
      // many FILES could contain a,b in [24, 31]? (what parquet footer
      // stats decide before reading a byte)
      def filesMatching(path: String, c: String): Int = {
        val files = new java.io.File(path).listFiles()
          .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
        files.count { f =>
          val mm = spark.read.parquet(f)
            .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).collect()(0)
          mm.getLong(0) <= 31L && mm.getLong(1) >= 24L
        }
      }
      val za = filesMatching(s"$dir/z", "a")
      val zb = filesMatching(s"$dir/z", "b")
      val fa = filesMatching(s"$dir/flat", "a")
      val fb = filesMatching(s"$dir/flat", "b")
      // single-column sort: perfect on the sorted dim, useless on the other
      assert(fa <= 4, s"a-sorted layout should prune a-ranges hard: $fa")
      assert(fb >= 14, s"a-sorted layout cannot prune b-ranges: $fb")
      // z-order: a 1/8-wide range on EITHER dim touches a strict subset
      assert(za <= 8 && zb <= 8,
        s"z-order must prune both dims: a=$za b=$zb of 16")
      // and the data survives the round trip intact
      assert(spark.read.parquet(s"$dir/z").count() == 4096)
      assert(spark.read.parquet(s"$dir/z")
        .exceptAll(df).count() == 0)
    } finally {
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
