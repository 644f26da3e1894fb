package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Deduplication operators for large-scale training-data pipelines —
 * generalizing the reference's content-hash duplicate detection
 * (reference: manifest_processor.py:283-305, ETag table dynamodb.py:22-40,
 * scripts/handle_duplicates/find_and_delete_duplicates.py:76-124) from
 * exact file hashes to exact + near-duplicate document similarity.
 *
 * Scale design: every method is shuffle-bounded by the CANDIDATE set, not
 * the pair space —
 *  - exact: one hash-groupBy (partial agg map-side).
 *  - MinHash-LSH: band-bucket join; only same-bucket docs pair up. Hot
 *    buckets are quadratic, so `maxBucketSize` drops degenerate buckets
 *    (documented contract; a skipped bucket means "too common to be a
 *    useful near-dup signal", same spirit as stopword removal).
 *  - SimHash: pairs restricted to a blocking key (here: equal 16-bit
 *    simhash bands) rather than all-pairs.
 *  - n-gram Jaccard: inverted-index join on shared shingles — pair count
 *    bounded by Σ_shingle df², controlled by the same bucket cap.
 */
object Dedup {

  /** Exact duplicate groups by content hash (md5 — portable across
    * engines). Returns (key, n_dups, member ids). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_md5"))
      .groupBy("content_md5")
      .agg(count(lit(1)).as("n_dups"),
        sort_array(collect_list(col(idCol))).as("members"))
      .filter(col("n_dups") > 1)

  /** (id, minhash signature) for every doc. k = signature length.
    *
    * Computed as explode(shingle hashes) -> groupBy(id) with k MIN
    * aggregates, assembled into the signature array. The aggregation is a
    * hard optimizer barrier: expression-only formulations get their
    * signature lambda re-inlined by CollapseProject into every downstream
    * band reference — measured 64x re-evaluation of the shingle hashing at
    * sf0.1. It is also the scalable shape (shingle set may exceed a row's
    * comfortable working size; the shuffle is (id, hash) pairs). */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String, k: Int,
      shingleN: Int = 3): DataFrame = {
    val hashes = df.select(
      col(idCol),
      explode_outer(shingleHashes(col(textCol), shingleN)).as("h"))
    val minCols = (0 until k).map { i =>
      min(pmod(col("h") * (i * 2 + 1) + (i * 1000003L + 12345L),
        lit(graft.functions.TextFunctions.HashMod))).as(s"m$i")
    }
    hashes
      .groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash-LSH candidate pairs with estimated Jaccard >= minEstSim.
    * Signature split into `bands` bands of k/bands rows; docs sharing any
    * band bucket become candidates; est sim = matching minhash fraction. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, minEstSim: Double = 0.5,
      shingleN: Int = 3, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val rows = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)

    val banded = sigs.select(
      col(idCol), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => concat_ws("_", slice(col("sig"), b * rows + 1, lit(rows)))))
        .as(Seq("band_idx", "band_key")))

    val capped =
      if (maxBucketSize == Int.MaxValue) banded
      else {
        val sizes = banded.groupBy("band_idx", "band_key")
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= maxBucketSize)
        banded.join(sizes, Seq("band_idx", "band_key"), "left_semi")
      }

    val l = capped.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val r = capped.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))

    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(
        col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          x === y), b => b)).cast("double") / k).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  /** (id, simhash) for every doc — `bits`-wide locality-sensitive hash. */
  def simhashes(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    df.select(col(idCol), simhash(col(textCol), bits).as("simhash"))

  /** SimHash near-dup pairs: hamming distance <= maxHamming. Blocking: a
    * pair must match on at least one half of the simhash (pigeonhole: any
    * pair within hamming distance <= bits/2-1 per half shares a half when
    * maxHamming < 2; for small maxHamming this is the classic
    * multi-index approach), keeping the join linear in bucket sizes. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val half = bits / 2
    val sh = simhashes(df, idCol, textCol, bits)
      .select(col(idCol), col("simhash"),
        (col("simhash") % (1L << half)).as("lo"),
        shiftright(col("simhash"), half).as("hi"))

    // two blocking passes: equal low half OR equal high half
    // (complete for maxHamming <= half by pigeonhole when distance
    // concentrates in one half; standard SimHash multi-index trade-off,
    // documented as approximate for distances split across both halves)
    def pairsOn(key: String) = {
      val l = sh.select(col(key).as("k"), col(idCol).as("id_a"),
        col("simhash").as("sh_a"))
      val r = sh.select(col(key).as("k"), col(idCol).as("id_b"),
        col("simhash").as("sh_b"))
      l.join(r, Seq("k")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
    }

    pairsOn("lo").unionByName(pairsOn("hi")).distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs >= minJaccard via inverted-index join on
    * shared shingles (no all-pairs blowup; only docs sharing a shingle
    * meet). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val docShingles = df.select(
      col(idCol),
      explode(array_distinct(shingles(words(col(textCol)), shingleN)))
        .as("shingle"))

    val sizes = docShingles.groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"))

    val l = docShingles.select(col("shingle"), col(idCol).as("id_a"))
    val r = docShingles.select(col("shingle"), col(idCol).as("id_b"))
    val inter = l.join(r, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))

    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_shingles").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_shingles").as("n_b")),
        Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
