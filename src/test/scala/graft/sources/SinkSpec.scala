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
}
