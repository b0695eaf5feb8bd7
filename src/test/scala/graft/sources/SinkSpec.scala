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
    Sink.readStore(spark, path).select($"id", $"version", $"payload")
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

  private def manifestEntries(path: String): Map[Long, String] = {
    val mf = Files.list(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.matches("manifest-[0-9]{9}\\.mf")).toSeq
      .maxBy(_.getFileName.toString)
    Files.readAllLines(mf).asScala.filter(_.nonEmpty).map { l =>
      val Array(b, d) = l.split("\t", 2); b.toLong -> d
    }.toMap
  }

  test("upsertBuckets rewrites ONLY the buckets the batch touches") {
    val path = tmp("upsertpartial")
    val seed = (1L to 64L).map(i => (i, 1L, s"v$i")).toDF("id", "version", "payload")
    Sink.upsertBuckets(path, seed, "id", "version", nBuckets = 8)
    val before = manifestEntries(path)
    assert(before.nonEmpty)
    // one single-key batch touches exactly one bucket: the new manifest must
    // keep every other bucket's dir IDENTICAL (untouched data never rewritten)
    val one = Seq((7L, 9L, "v7new")).toDF("id", "version", "payload")
    Sink.upsertBuckets(path, one, "id", "version", nBuckets = 8)
    val after = manifestEntries(path)
    val changed = before.keySet.count(b => before(b) != after.getOrElse(b, ""))
    assert(changed == 1, s"expected exactly one remapped bucket, got $changed")
    assert(storeRows(path)(7L) == ((9L, "v7new")))
    assert(storeRows(path)(8L) == ((1L, "v8")))
  }

  test("upsertBuckets survives a crash window: previous manifest and data stay intact") {
    val path = tmp("upsertcrash")
    val b1 = Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("id", "version", "payload")
    Sink.upsertBuckets(path, b1, "id", "version", nBuckets = 4)
    val committed = storeRows(path)
    // simulate a writer that died after writing an epoch dir but BEFORE
    // publishing its manifest: an orphan epoch must be invisible to readers
    val orphan = Paths.get(path, "e-deadbeef-000000099")
    Files.createDirectories(orphan)
    assert(storeRows(path) == committed)
    // the replayed batch then merges against the intact store
    Sink.upsertBuckets(path, Seq((1L, 2L, "a2")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 4)
    assert(storeRows(path) == Map(1L -> ((2L, "a2")), 2L -> ((1L, "b1"))))
    // vacuum reclaims the orphan and superseded manifests without changing rows
    Sink.vacuumStore(path)
    assert(!Files.exists(orphan))
    assert(storeRows(path) == Map(1L -> ((2L, "a2")), 2L -> ((1L, "b1"))))
  }

  test("compactStore: one epoch, one file per bucket, committed rows bit-identical") {
    val path = tmp("compact")
    // five batches over disjoint key slices scatter the live buckets
    // across five epochs (each batch remaps only the buckets it touches)
    for (i <- 1 to 5) {
      val b = (1L to 40L).filter(_ % 5 == i % 5)
        .map(id => (id, i.toLong, s"v$id-$i")).toDF("id", "version", "payload")
      Sink.upsertBuckets(path, b, "id", "version", nBuckets = 8)
    }
    val before = storeRows(path)
    def epochsOf(m: Map[Long, String]): Set[String] = m.values.map(_.split("/")(0)).toSet
    assert(epochsOf(manifestEntries(path)).size > 1, "history should span several epochs")
    Sink.compactStore(spark, path)
    // pure data movement: the committed view is unchanged
    assert(storeRows(path) == before)
    val after = manifestEntries(path)
    assert(epochsOf(after).size == 1, s"expected one epoch, got ${epochsOf(after)}")
    // one parquet data file per bucket directory
    after.values.foreach { d =>
      val files = Files.list(Paths.get(path, d)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"bucket dir $d holds ${files.size} files")
    }
    // vacuum now reclaims EVERY older epoch; rows still identical
    Sink.vacuumStore(path)
    val liveDirs = Files.list(Paths.get(path)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("e-")).toSeq
    assert(liveDirs.size == 1, s"expected only the compacted epoch, got $liveDirs")
    assert(storeRows(path) == before)
    // and the store keeps accepting upserts on the compacted layout
    Sink.upsertBuckets(path, Seq((1L, 99L, "z")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 8)
    assert(storeRows(path)(1L) == ((99L, "z")))
  }

  test("upsertBuckets: an effectively-empty batch is a no-op (no entry-less manifest)") {
    val path = tmp("upsertempty")
    // null-key/self-filtered batch on a VIRGIN store: nothing may commit —
    // a zero-entry manifest would make storeExists true while readStore
    // rejects forever
    val empty = Seq((null.asInstanceOf[java.lang.Long], 1L, "x"))
      .toDF("id", "version", "payload")
    Sink.upsertBuckets(path, empty, "id", "version", nBuckets = 4)
    assert(!Sink.storeExists(path))
    // and on a store WITH data, an empty batch changes nothing
    Sink.upsertBuckets(path, Seq((1L, 1L, "a")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 4)
    val before = storeRows(path)
    Sink.upsertBuckets(path, empty, "id", "version", nBuckets = 4)
    assert(storeRows(path) == before)
  }

  test("upsertBuckets leaves session conf untouched (no global overwrite-mode mutation)") {
    val path = tmp("upsertconf")
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    Sink.upsertBuckets(path, Seq((1L, 1L, "x")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 2)
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode") == before)
  }

  test("writeIndex/readIndex: snapshot round trip is column-identical; rewrite supersedes; vacuum reclaims") {
    val path = tmp("idx")
    val v1 = Seq((1L, 0L, "x"), (2L, 1L, "y"), (3L, 0L, "z"))
      .toDF("id", "cent_id", "payload")
    assert(!Sink.indexExists(path))
    Sink.writeIndex(v1, path, partitionCols = Seq("cent_id"))
    assert(Sink.indexExists(path))
    val back = Sink.readIndex(spark, path)
    // names, types, AND order survive (partition copies stripped); only
    // nullability widens — the standard parquet round-trip relaxation
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      v1.schema.map(f => (f.name, f.dataType)),
      s"schema changed: ${back.schema} vs ${v1.schema}")
    assert(back.collect().map(_.toSeq).toSet == v1.collect().map(_.toSeq).toSet)
    // partition layout: one directory per cent_id value under the epoch
    val pdirs = Files.walk(Paths.get(path)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filter(_.startsWith("__p_cent_id=")).toSet
    assert(pdirs == Set("__p_cent_id=0", "__p_cent_id=1"))
    // whole-asset replace: a rebuild supersedes, old epoch becomes garbage
    val v2 = Seq((9L, 2L, "r")).toDF("id", "cent_id", "payload")
    Sink.writeIndex(v2, path, partitionCols = Seq("cent_id"))
    assert(Sink.readIndex(spark, path).collect().map(_.toSeq).toSet ==
      v2.collect().map(_.toSeq).toSet)
    Sink.vacuumStore(path)
    val epochs = Files.list(Paths.get(path)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filter(_.startsWith("e-")).toSeq
    assert(epochs.size == 1, s"vacuum should leave only the live epoch, got $epochs")
    assert(Sink.readIndex(spark, path).count() == 1)
  }

  test("writeIndex never commits a file-less epoch: an empty index leaves the store uncommitted") {
    val path = tmp("idxempty")
    val empty = Seq.empty[(Long, Long, String)].toDF("id", "cent_id", "payload")
    // zero-row PARTITIONED write produces no parquet files; committing its
    // manifest would poison the store (indexExists true, readIndex throws,
    // load-or-build never rebuilds). The guard must leave the store absent.
    Sink.writeIndex(empty, path, partitionCols = Seq("cent_id"))
    assert(!Sink.indexExists(path),
      "an empty partitioned index write must not commit a manifest")
    // and the store is still buildable afterwards — the rebuild branch runs
    val v1 = Seq((1L, 0L, "x")).toDF("id", "cent_id", "payload")
    Sink.writeIndex(v1, path, partitionCols = Seq("cent_id"))
    assert(Sink.indexExists(path))
    assert(Sink.readIndex(spark, path).count() == 1)
    // an UNPARTITIONED zero-row write may legitimately carry a schema-only
    // parquet file; either outcome must keep the store readable-or-absent
    val path2 = tmp("idxempty2")
    Sink.writeIndex(empty, path2)
    if (Sink.indexExists(path2)) assert(Sink.readIndex(spark, path2).count() == 0)
  }

  test("same-version key ties resolve by the column AFTER the version (the streamingNearDups live contract)") {
    val path = tmp("livetie")
    // streamingNearDups writes a tombstone (live=false) and a fresh verdict
    // (live=true) for the SAME pair key in the SAME batch when a re-ingested
    // doc re-certifies a pair. The store's winner is max(struct(version,
    // <other cols in frame order>)), so `live` sits directly after the
    // version and true beats false REGARDLESS of later columns (here the
    // tombstone carries the HIGHER jaccard — if jaccard decided first, the
    // dead row would win)
    val rows = Seq(
      ("1|3", false, 1L, 3L, 1.0, 7L),  // tombstone, old jaccard 1.0
      ("1|3", true,  1L, 3L, 0.6, 7L))  // fresh verdict, lower jaccard
      .toDF("pair_key", "live", "batch_id", "standing_id", "jaccard", "version")
    Sink.upsertBuckets(path, rows, "pair_key", "version", nBuckets = 2)
    val winner = Sink.readStore(spark, path).collect()
    assert(winner.length == 1)
    assert(winner.head.getAs[Boolean]("live"),
      s"the fresh live=true verdict must win the same-version tie: ${winner.head}")
    assert(winner.head.getAs[Double]("jaccard") == 0.6)
  }

  test("writeIndex rejects reserved __p_ columns and unknown partition cols") {
    val path = tmp("idxbad")
    val df = Seq((1L, "a")).toDF("id", "payload")
    intercept[IllegalArgumentException](Sink.writeIndex(df, path, Seq("nope")))
    val reserved = df.withColumn("__p_id", $"id")
    intercept[IllegalArgumentException](Sink.writeIndex(reserved, path))
  }

  test("deleteKeys: tombstoned row excluded; old replays stay dead; higher-version re-ingest resurrects") {
    val path = tmp("deletekeys")
    Sink.upsertBuckets(path,
      Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 1L, "c1")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 4)
    Sink.deleteKeys(path, Seq((2L, 5L)).toDF("id", "version"), "id", "version", nBuckets = 4)
    assert(storeRows(path) == Map(1L -> ((1L, "a1")), 3L -> ((1L, "c1"))))
    // a REPLAYED old batch (version <= tombstone) cannot resurrect the key
    Sink.upsertBuckets(path, Seq((2L, 3L, "b3")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 4)
    assert(storeRows(path) == Map(1L -> ((1L, "a1")), 3L -> ((1L, "c1"))))
    // deletion replays are idempotent (the side-store is an upsert store)
    Sink.deleteKeys(path, Seq((2L, 5L)).toDF("id", "version"), "id", "version", nBuckets = 4)
    assert(storeRows(path) == Map(1L -> ((1L, "a1")), 3L -> ((1L, "c1"))))
    // a LATER re-ingest (strictly higher version) resurrects — takedown-then-relicense
    Sink.upsertBuckets(path, Seq((2L, 6L, "b6")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 4)
    assert(storeRows(path) == Map(1L -> ((1L, "a1")), 2L -> ((6L, "b6")), 3L -> ((1L, "c1"))))
  }

  test("deleteKeys + compactStore: the deleted row's bytes physically leave the store") {
    val path = tmp("deletecompact")
    // nBuckets = 1: both keys share a bucket, so the purge must filter rows
    // WITHIN a surviving bucket (not just drop a whole bucket entry)
    Sink.upsertBuckets(path,
      Seq((1L, 1L, "keepme"), (2L, 1L, "purgeme")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 1)
    Sink.deleteKeys(path, Seq((2L, 5L)).toDF("id", "version"), "id", "version", nBuckets = 1)
    Sink.compactStore(spark, path)
    Sink.vacuumStore(path)
    assert(storeRows(path) == Map(1L -> ((1L, "keepme"))))
    // RAW bytes check: no parquet file under any live epoch still carries
    // the dead row (readStore filtering alone would not satisfy takedown)
    val rawRows = parquetFiles(path)
      .filterNot(_.toString.contains("__deletes"))
      .flatMap(f => spark.read.parquet(f.toString).select($"id").collect().map(_.getLong(0)))
    assert(rawRows.toSet == Set(1L), s"dead row still physically present: $rawRows")
    // post-compaction replay of an old batch STILL cannot resurrect
    Sink.upsertBuckets(path, Seq((2L, 3L, "b3")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 1)
    assert(storeRows(path) == Map(1L -> ((1L, "keepme"))))
  }

  test("deleteKeys emptying a whole bucket removes its manifest entry") {
    val path = tmp("deletebucket")
    // nBuckets = 64 so each key almost surely owns its bucket
    Sink.upsertBuckets(path,
      Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("id", "version", "payload"),
      "id", "version", nBuckets = 64)
    Sink.deleteKeys(path, Seq((2L, 5L)).toDF("id", "version"), "id", "version", nBuckets = 64)
    Sink.compactStore(spark, path)
    Sink.vacuumStore(path)
    // readStore must not fail on a dangling manifest entry for the emptied bucket
    assert(storeRows(path) == Map(1L -> ((1L, "a1"))))
  }

  test("a manifest number can be claimed exactly once (concurrent-writer guard)") {
    val path = tmp("manifestclaim")
    Sink.publishManifest(path, 1L, Map(0L -> "epoch-a/__pb=0"))
    // POSIX rename silently replaces, so the guard must NOT rely on
    // ATOMIC_MOVE throwing — the hard-link claim makes the second writer
    // fail loudly and leaves the first writer's manifest untouched
    val e = intercept[IllegalStateException](
      Sink.publishManifest(path, 1L, Map(0L -> "epoch-b/__pb=0")))
    assert(e.getMessage.contains("concurrent writer"))
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "manifest-000000001.mf")), "UTF-8")
    assert(body.contains("epoch-a") && !body.contains("epoch-b"))
    // no temp litter left behind by either writer
    val stray = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith(".manifest-tmp-"))
    assert(stray.isEmpty, s"temp files left behind: ${stray.mkString(", ")}")
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
