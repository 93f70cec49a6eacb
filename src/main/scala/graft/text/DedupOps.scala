package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document deduplication family: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, and winnowing fingerprints.
  *
  * Scale design (SURVEY §4):
  *  - Exact dedup is a hash-groupBy with map-side combine.
  *  - Jaccard candidates come from a POSTINGS self-join on shared
  *    grams with a document-frequency cutoff — never an O(n²) cross
  *    join; the gram is the shuffle key, and the df cutoff bounds the
  *    worst bucket (a gram in df docs contributes df² pairs).
  *  - MinHash/LSH: per-(doc,seed) min aggregation (partial agg), then
  *    band-bucket self-join — candidates only within equal 4-seed
  *    band hashes.
  *  - SimHash: per-(doc,bit) signed counts (partial agg; no
  *    collect_list), banded hamming join, exact `bit_count(xor)`
  *    verification.
  *  - All similarity decisions use exact integer arithmetic.
  */
object DedupOps {
  /** Exact duplicate groups by normalized text: one row per distinct
    * text with the keeper (min id) and the multiplicity. */
  def exactGroups(docs: DataFrame, id: String, text: Column): DataFrame =
    docs
      .groupBy(md5(text).as("text_md5"))
      .agg(
        min(col(id)).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"),
        min(length(text)).cast("long").as("n_chars")
      )

  /** Word n-grams (distinct per doc) of `text`, as (id, gram). */
  def wordGrams(docs: DataFrame, id: String, text: Column, n: Int): DataFrame = {
    val toks = TextOps.tokens(text)
    // guard: sequence(0, k) is DESCENDING for k<0, so short docs need
    // an explicit empty array rather than a negative upper bound
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))
      ))
    docs.select(col(id), explode(array_distinct(grams)).as("gram"))
  }

  /** Exact n-gram Jaccard pairs over "informative" grams (document
    * frequency <= maxDf). Emits integer gram counts and a half-up
    * integer Jaccard percentage; pairs kept when
    * shared / union >= minJaccardPct / 100, decided in exact integer
    * arithmetic. */
  def ngramJaccardPairs(
      docs: DataFrame, id: String, text: Column,
      n: Int, maxDf: Int, minJaccardPct: Int
  ): DataFrame = {
    val grams = wordGrams(docs, id, text, n)

    // document-frequency cutoff: drop grams too common to be informative
    val df = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    val kept = grams.join(df.where(col("__df") <= maxDf), "gram")

    val counts = kept.groupBy(col(id)).agg(count(lit(1)).as("n_grams"))

    val a = kept.select(col(id).as("doc1"), col("gram"))
    val b = kept.select(col(id).as("doc2"), col("gram"))
    val shared = a.join(b, "gram")
      .where(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("shared_grams"))

    val withCounts = shared
      .join(counts.select(col(id).as("doc1"), col("n_grams").as("grams1")), "doc1")
      .join(counts.select(col(id).as("doc2"), col("n_grams").as("grams2")), "doc2")
      .withColumn("union_grams", col("grams1") + col("grams2") - col("shared_grams"))

    withCounts
      .where(col("shared_grams") * 100 >= col("union_grams") * minJaccardPct)
      .select(
        col("doc1"), col("doc2"), col("shared_grams"),
        col("grams1"), col("grams2"),
        call_function("div",
          col("shared_grams") * 200L + col("union_grams"),
          col("union_grams") * 2L
        ).as("jaccard_pct")
      )
  }

  /** MinHash signatures: k min-hashes per doc via seeded xxhash64
    * over distinct grams. Returns (id, sig: array<long> of length k).
    * The per-(doc,seed) min is a partial aggregation — the shuffle
    * carries k rows per doc per map task, independent of doc size. */
  def minhashSignatures(grams: DataFrame, id: String, k: Int): DataFrame = {
    val seeded = grams
      .withColumn("seed", explode(sequence(lit(0), lit(k - 1))))
      .groupBy(col(id), col("seed"))
      .agg(min(xxhash64(col("seed"), col("gram"))).as("mh"))
    seeded
      .groupBy(col(id))
      .agg(array_sort(collect_list(struct(col("seed"), col("mh")))).as("__s"))
      .select(col(id), transform(col("__s"), s => s.getField("mh")).as("sig"))
  }

  /** LSH candidate pairs from MinHash signatures: `bands` bands of
    * `k/bands` rows; docs sharing any band bucket become candidates;
    * estimated similarity = fraction of matching seeds. */
  def minhashLshPairs(sigs: DataFrame, id: String, k: Int, bands: Int, minEst: Double): DataFrame = {
    require(k % bands == 0)
    val r = k / bands
    val banded = sigs.select(
      col(id),
      col("sig"),
      explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(b, slice(col("sig"), b * r + 1, lit(r)).cast("string")).as("bkey")))
      ).as("bb")
    ).select(col(id), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val a = banded.select(col(id).as("doc1"), col("sig").as("sig1"), col("band"), col("bkey"))
    val b = banded.select(col(id).as("doc2"), col("sig").as("sig2"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"), col("sig1"), col("sig2"))
      .distinct()
      .withColumn(
        "est_sim",
        aggregate(
          zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v
        ).cast("double") / k
      )
      .where(col("est_sim") >= minEst)
      .select("doc1", "doc2", "est_sim")
  }

  /** 64-bit SimHash per doc from token multiset. Fully relational:
    * per-(doc,bit) signed sums (partial agg), then bit assembly. */
  def simhash(docs: DataFrame, id: String, text: Column): DataFrame = {
    val toks = docs.select(col(id), explode(TextOps.tokens(text)).as("token"))
      .groupBy(col(id), col("token")).agg(count(lit(1)).as("cnt"))
    val bits = toks
      .withColumn("j", explode(sequence(lit(0), lit(63))))
      .withColumn(
        "contrib",
        when(call_function("shiftright", xxhash64(col("token")), col("j").cast("int")).bitwiseAND(lit(1L)) === 1L, col("cnt"))
          .otherwise(-col("cnt"))
      )
      .groupBy(col(id), col("j"))
      .agg(sum(col("contrib")).as("s"))
    bits
      .groupBy(col(id))
      .agg(sum(when(col("s") > 0, call_function("shiftleft", lit(1L), col("j").cast("int"))).otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance <= maxDist, using
    * 4×16-bit band buckets (pigeonhole: dist<=3 guarantees one equal
    * band) then exact `bit_count(xor)` verification. */
  def simhashPairs(hashes: DataFrame, id: String, maxDist: Int): DataFrame = {
    val banded = hashes.select(
      col(id), col("simhash"),
      explode(
        transform(sequence(lit(0), lit(3)),
          b => struct(b.as("band"), call_function("shiftright", col("simhash"), (b * 16).cast("int")).bitwiseAND(lit(0xFFFFL)).as("bkey")))
      ).as("bb")
    ).select(col(id), col("simhash"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val a = banded.select(col(id).as("doc1"), col("simhash").as("h1"), col("band"), col("bkey"))
    val b = banded.select(col(id).as("doc2"), col("simhash").as("h2"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"), col("h1"), col("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .where(col("hamming") <= maxDist)
      .select("doc1", "doc2", "hamming")
  }

  /** Winnowing fingerprints (rolling Karp–Rabin sketch): hash word
    * n-grams, take the min hash of every `window` consecutive grams,
    * keep distinct mins per doc. */
  def fingerprints(docs: DataFrame, id: String, text: Column, n: Int, window: Int): DataFrame = {
    val toks = TextOps.tokens(text)
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))
      ))
    val positioned = docs
      .select(col(id), posexplode(grams).as(Seq("pos", "gram")))
      .withColumn("h", xxhash64(col("gram")))
    val w = Window.partitionBy(col(id)).orderBy(col("pos")).rowsBetween(0, window - 1)
    positioned
      .withColumn("fp", min(col("h")).over(w))
      .select(col(id), col("fp"))
      .distinct()
  }
}
