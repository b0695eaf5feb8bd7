package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora. All of them are pure
 * DataFrame transformations — shuffles only on the candidate keys, no
 * driver-side loops, no group materialization — so every step scales out
 * with `spark.sql.shuffle.partitions` / AQE.
 *
 * Pipeline shape (the standard MinHash-LSH dedup):
 *   shingle -> minhash signature -> band buckets -> bucket self-join
 *   (candidates) -> exact-similarity verify.
 * The LSH band join bounds the quadratic blow-up to rows sharing a band
 * bucket, which is what makes near-dup detection feasible at 100 TB.
 *
 * CACHE LIFETIME: the near-dup pipelines persist their small id-only
 * candidate/bucket frames (read by both self-join sides) and, being lazy,
 * cannot unpersist them. One-shot jobs are unaffected; long-lived
 * applications calling these repeatedly should `spark.catalog.clearCache()`
 * between pipelines or manage eviction via storage-memory limits.
 */
object Dedup {

  /** Exact dedup: smallest id per identical value of `on`. A single
    * hash-aggregation with map-side partial combine; at scale this is the
    * cheapest possible exact dedup (one shuffle on the dedup key). */
  def exact(df: DataFrame, idCol: String, on: Column): DataFrame =
    df.groupBy(on.as("dedup_key"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Distinct word n-gram shingles as an array column (native expressions:
    * `sequence` + `transform` + `slice`, fully codegen'd). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    val grams = transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + lit(1), lit(n))))
    array_distinct(when(size(words) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /**
   * Distinct word n-gram shingles as 64-bit FNV-1a hashes, one (id, h) row per
   * shingle — computed in typed JVM code (`mapPartitions`), NOT as Catalyst
   * higher-order functions: `transform`/`slice` are interpreted per row and
   * dominated the whole minhash pipeline. Hashing words directly also skips
   * materializing shingle strings through the shuffle.
   */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val words = if (text == null) Array.empty[String] else text.trim.split("\\s+")
          if (words.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[java.lang.Long]()
            (0 to words.length - n).iterator.flatMap { i =>
              var h = 1469598103934665603L // FNV-1a 64 offset basis
              var j = i
              while (j < i + n) {
                val w = words(j)
                var k = 0
                while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
                h ^= ' '; h *= 1099511628211L
                j += 1
              }
              if (seen.add(h)) Iterator.single((id, h)) else Iterator.empty
            }
          }
        }
      }
      .toDF(idCol, "h")
  }

  /** Fixed affine permutation for minhash over the field mod 2^31-1 (Mersenne
    * prime). All intermediates stay below 2^62, so long arithmetic cannot
    * overflow; constants are arbitrary public values, deterministic. */
  private val MersenneP = 2147483647L

  /**
   * MinHash signature (numHashes lanes) per id, computed in ONE narrow pass:
   * for each document, FNV-1a-hash every word n-gram and fold it into the
   * per-lane running minima. Duplicate shingles cannot change a min, so no
   * dedup set is needed and the result is identical to the explode →
   * groupBy(min) formulation — without shuffling a row per shingle. Documents
   * shorter than the shingle width yield no signature (no shingle set).
   */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, shingleN: Int, numHashes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = MersenneP
    val as = Array.tabulate(numHashes)(i => (2L * i + 12345L) % p)
    val bs = Array.tabulate(numHashes)(i => (981234567L * (i + 1)) % p)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val words = if (text == null) Array.empty[String] else text.trim.split("\\s+")
          if (words.length < shingleN) Iterator.empty
          else {
            val mins = Array.fill(numHashes)(Long.MaxValue)
            var i = 0
            while (i <= words.length - shingleN) {
              var h = 1469598103934665603L // FNV-1a 64 offset basis
              var j = i
              while (j < i + shingleN) {
                val w = words(j)
                var k = 0
                while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
                h ^= ' '; h *= 1099511628211L
                j += 1
              }
              val hMod = (h % p + p) % p
              var l = 0
              while (l < numHashes) {
                val perm = (hMod * as(l) + bs(l)) % p
                if (perm < mins(l)) mins(l) = perm
                l += 1
              }
              i += 1
            }
            Iterator.single((id, mins.toSeq))
          }
        }
      }
      .toDF(idCol, "signature")
  }

  /**
   * LSH banding: split the signature into `bands` bands of `rowsPerBand`
   * lanes, hash each band to a bucket, self-join on (band, bucket).
   * Returns candidate pairs (id_a < id_b), deduplicated.
   */
  def lshCandidates(signatures: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = signatures.select(
      col(idCol),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => col("signature")(b * rowsPerBand + r).cast("string")): _*))
      }: _*)).as(Seq("band", "bucket")))
      // both self-join sides read this (ids + band buckets only) — persist so
      // the signature pass scans the corpus once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact shingle-set Jaccard for given candidate pairs (verify step).
    * Shingle sets are re-derived as FNV-1a hash arrays only for ids that
    * appear in a candidate pair (semi-join first), so the expensive set math
    * runs on a tiny fraction of the corpus. */
  def jaccardVerify(candidates: DataFrame, corpus: DataFrame, idCol: String, textCol: String, shingleN: Int, threshold: Double): DataFrame = {
    val ids = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
      .distinct()
    val needed = corpus.join(ids, Seq(idCol), "left_semi")
    val sh = shingleHashes(needed, idCol, textCol, shingleN)
      .groupBy(col(idCol)).agg(collect_list(col("h")).as("sh"))
    val j = candidates
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
    j.where(col("jaccard") >= threshold).select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates then exact verify.
    * The candidate-pair set (small: ids only, LSH-bounded) is persisted —
    * `jaccardVerify` references it three times (both id sides + the pair
    * join), and recomputing the bucket-join subtree 3x dominates runtime. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 3,
                      numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands): " +
        "integer division would silently drop signature lanes, and rowsPerBand=0 " +
        "hashes an empty band for every row, degenerating to an all-pairs join")
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
    val cands = lshCandidates(sigs, idCol, bands, numHashes / bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardVerify(cands, df, idCol, textCol, shingleN, threshold)
  }

  /**
   * SimHash (64-bit) per id: per bit position, sum +1/-1 votes of each
   * token-hash's bit, assemble the sign vector into one long. Computed in one
   * NARROW pass per document (FNV-1a token hash, local vote array) — a
   * per-doc-computable signature needs no explode/aggregate shuffle at all.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val votes = new Array[Int](64) // reused across docs in the partition
        rows.filter(_._2 != null).map { case (id, text) =>
          java.util.Arrays.fill(votes, 0)
          val words = text.trim.split("\\s+")
          var i = 0
          while (i < words.length) {
            val w = words(i)
            var h = 1469598103934665603L // FNV-1a 64
            var k = 0
            while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
              b += 1
            }
            i += 1
          }
          var sim = 0L
          var b = 0
          while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
          (id, sim)
        }
      }
      .toDF(idCol, "simhash")
  }

  /**
   * SimHash near-dups with Hamming distance <= maxHamming: band the 64 bits
   * into (maxHamming+1) chunks — by pigeonhole, any pair within the distance
   * agrees exactly on at least one chunk — join per chunk, then verify with
   * `bit_count(xor)`.
   */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val sigs = simhash(df, idCol, textCol)
    val banded = sigs.select(
      col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftrightunsigned(col("simhash"), c * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("chunk", "chunk_val")))
      // both self-join sides read this (id + simhash + chunk) — persist so the
      // signature pass runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sim_a"), col("chunk"), col("chunk_val"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sim_b"), col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
