package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class SinkSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toSeq

  test("writePartitionedParquet produces one dir per value, few files, and round-trips") {
    val df = (1 to 1000).map(i => (i.toLong, s"src${i % 3}", i * 2.0)).toDF("id", "source", "v")
    val path = tmp("sinkpart")
    Sink.writePartitionedParquet(df, path, Seq("source"))
    val dirs = Files.list(Paths.get(path)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    assert(dirs == Set("source=src0", "source=src1", "source=src2"))
    // pre-shuffle onto the partition col => each value dir written by ONE task
    dirs.foreach { d =>
      assert(parquetFiles(s"$path/$d").size == 1, s"expected one file under $d")
    }
    val back = spark.read.parquet(path)
    assert(back.count() == 1000)
    assert(back.where($"source" === "src1").count() == (1 to 1000).count(_ % 3 == 1))
  }

  test("writePartitionedParquet honors maxRecordsPerFile") {
    val df = (1 to 900).map(i => (i.toLong, "a")).toDF("id", "source")
    val path = tmp("sinkmax")
    Sink.writePartitionedParquet(df, path, Seq("source"), maxRecordsPerFile = 200L)
    val files = parquetFiles(s"$path/source=a")
    assert(files.size >= 5, s"900 rows at <=200/file need >=5 files, got ${files.size}")
    files.foreach { f =>
      assert(spark.read.parquet(f.toString).count() <= 200)
    }
  }

  test("writeRangeSortedParquet files carry NON-OVERLAPPING id ranges (file-level pruning)") {
    val df = (1 to 1000).map(i => (i.toLong, i.toString)).toDF("id", "s")
    val path = tmp("sinkrange")
    Sink.writeRangeSortedParquet(df, path, Seq("id"), numFiles = 4)
    val ranges = parquetFiles(path).map { f =>
      val mm = spark.read.parquet(f.toString)
        .agg(org.apache.spark.sql.functions.min($"id"), org.apache.spark.sql.functions.max($"id"))
        .head()
      (mm.getLong(0), mm.getLong(1))
    }.sortBy(_._1)
    assert(ranges.size == 4)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(path).count() == 1000)
  }

  private def storeRows(path: String): Map[Long, (Long, String)] =
    spark.read.parquet(path).select($"id", $"version", $"payload")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("upsertBuckets: last-writer-wins by version, out-of-order and replayed batches converge") {
    val path = tmp("upsert")
    val b1 = Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 2L, "c2")).toDF("id", "version", "payload")
    val b2 = Seq((1L, 3L, "a3"), (2L, 2L, "b2"), (4L, 1L, "d1")).toDF("id", "version", "payload")
    val late = Seq((1L, 2L, "a2"), (3L, 1L, "c1")).toDF("id", "version", "payload") // all stale
    Sink.upsertBuckets(path, b1, "id", "version", nBuckets = 8)
    Sink.upsertBuckets(path, b2, "id", "version", nBuckets = 8)
    Sink.upsertBuckets(path, late, "id", "version", nBuckets = 8)
    val expected = Map(1L -> ((3L, "a3")), 2L -> ((2L, "b2")), 3L -> ((2L, "c2")), 4L -> ((1L, "d1")))
    assert(storeRows(path) == expected)
    // idempotence: replaying EVERY batch again changes nothing
    Seq(b1, b2, late).foreach(Sink.upsertBuckets(path, _, "id", "version", nBuckets = 8))
    assert(storeRows(path) == expected)
  }

  test("upsertBuckets rewrites ONLY the buckets the batch touches") {
    val path = tmp("upsertpartial")
    val seed = (1L to 64L).map(i => (i, 1L, s"v$i")).toDF("id", "version", "payload")
    Sink.upsertBuckets(path, seed, "id", "version", nBuckets = 8)
    val bucketDirs = Files.list(Paths.get(path)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    assert(bucketDirs.nonEmpty)
    val filesBefore = bucketDirs.map(d => d -> parquetFiles(s"$path/$d").map(_.toString).toSet).toMap
    // one single-key batch touches exactly one bucket
    val one = Seq((7L, 9L, "v7new")).toDF("id", "version", "payload")
    Sink.upsertBuckets(path, one, "id", "version", nBuckets = 8)
    val touched = bucketDirs.count { d =>
      parquetFiles(s"$path/$d").map(_.toString).toSet != filesBefore(d)
    }
    assert(touched == 1, s"expected exactly one rewritten bucket, got $touched")
    assert(storeRows(path)(7L) == ((9L, "v7new")))
    assert(storeRows(path)(8L) == ((1L, "v8")))
  }

  test("upsertStream: micro-batched upserts equal the one-shot batch merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp("upsertstream")
    val ckpt = tmp("upsertckpt")
    val src = MemoryStream[(Long, Long, String)]
    val q = Sink.upsertStream(src.toDF().toDF("id", "version", "payload"),
      path, "id", "version", nBuckets = 4, checkpointDir = ckpt)
    try {
      src.addData((1L, 1L, "a1"), (2L, 2L, "b2"))
      q.processAllAvailable()
      src.addData((1L, 3L, "a3"), (1L, 2L, "a2"), (3L, 1L, "c1"))
      q.processAllAvailable()
    } finally q.stop()
    assert(storeRows(path) == Map(1L -> ((3L, "a3")), 2L -> ((2L, "b2")), 3L -> ((1L, "c1"))))
  }
}
