package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomContains

/** Bloom-filter membership gate for incremental corpus hygiene: "does
  * this key (text hash, n-gram, URL…) appear in the standing corpus?"
  * answered map-only, without joining the batch against the corpus.
  *
  * The pattern production dedup runs at 100 TB: the standing corpus's
  * key set is far too large to broadcast as a hash relation, but its
  * BLOOM FILTER is ~10 bits/key at 1% false positives — gigabytes for
  * tens of billions of keys, OR-merged in one treeAggregate pass. New
  * batches probe it as a projection (no corpus scan, no shuffle);
  * only the flagged survivors proceed to the exact/sketch verify
  * stage, whose cost is now proportional to candidates. No false
  * negatives, ever — a miss is PROOF the key is new.
  *
  * Build once, probe many: the serialized filter is a reusable index
  * artifact across batches, like the MinHash band keys of
  * [[DedupOps.minhashLshPairsAcross]].
  */
object BloomDedup {
  /** One-pass Bloom filter over the long `key` of `corpus`,
    * serialized. Sized by (`expectedItems`, `fpp`) — oversizing only
    * lowers the false-positive rate; the bits are parallelism-
    * invariant (OR-merge), so the same corpus yields the same bytes
    * at any partitioning. At true corpus scale, shard the build by
    * key range and probe the shards in turn — each shard stays
    * driver-collectable while the union covers the corpus. */
  def buildFilter(corpus: DataFrame, key: Column,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val f = corpus.select(key.as("__k")).where(col("__k").isNotNull)
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  /** `df` plus boolean `asCol`: whether the long `key` might be in
    * the filtered set. Map-only — one codegen'd probe per row. */
  def flag(df: DataFrame, key: Column, bits: Array[Byte], asCol: String): DataFrame =
    BloomContains.withProbe(df.sparkSession, bits) { fn =>
      df.withColumn(asCol, call_function(fn, key))
    }

  /** Corpus-side pre-gate for batch-vs-corpus joins: a Bloom over the
    * SMALL (batch) side's long key, probed MAP-ONLY on the BIG
    * (corpus-scale) side, reduces the big side to ~batch-matching rows
    * before any exchange. This is the join direction Spark can't save
    * on its own: a `left_anti`/`left_semi` with the small frame on the
    * LEFT only broadcasts the RIGHT side, so the corpus-scale right
    * would shuffle for a batch-sized question. After this gate the
    * survivor set is batch-sized (plus the fpp tail) and the exact
    * join the caller runs next can broadcast it.
    *
    * EXACTNESS: false negatives are impossible (the filter's defining
    * guarantee), so no true match is lost; false positives only pad
    * the survivor set and die in the caller's exact join.
    *
    * Driver state is the batch-keyed filter (~10 bits/key) — bounded
    * by the BATCH, never the corpus. The big side is scanned once,
    * map-only, no shuffle. */
  def gateBigSide(big: DataFrame, bigKey: Column,
                  small: DataFrame, smallKey: Column,
                  fpp: Double = 0.01): DataFrame = {
    val n = small.count()
    // empty batch side: no key can match, and Spark's bloomFilter
    // aggregate returns null bytes on zero rows — gate to nothing
    if (n == 0) big.where(lit(false))
    else {
      val bits = buildFilter(small, smallKey, n, fpp)
      flag(big, bigKey, bits, "__bloom_might")
        .where(col("__bloom_might")).drop("__bloom_might")
    }
  }
}
