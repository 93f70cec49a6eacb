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
}
