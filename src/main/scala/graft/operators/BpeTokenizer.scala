package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Corpus-level BPE merge training — the tokenizer-training operator of a
 * training-data pipeline (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units" — public algorithm).
 *
 * Reference analog: the reference pipeline validates per-file token
 * streams produced by an EXTERNAL tokenizer (validate_file_data.py's
 * per-file metrics assume tokens already exist); a corpus-scale engine
 * additionally LEARNS the tokenizer from the corpus. This is the
 * standard corpus-level formulation: merge statistics live on the WORD
 * VOCABULARY (word → corpus frequency), not the corpus itself, so after
 * ONE corpus pass (the word count) every Lloyd-style iteration is an
 * aggregation over a vocabulary-sized table — the same scale shape as
 * [[LinearModel.lmsTrain]] and `kmeansCodebookSeq`.
 *
 * Bit-portability: symbol sequences are represented as TWO-SPACE-joined
 * strings ("  a  b  "), so applying a merge is a plain (non-regex)
 * global substring replace — `replace(sym, " a  b ", " ab ")` — which
 * scans left-to-right non-overlapping in both the JVM and DuckDB. The
 * double-space separator is what makes back-to-back merge sites work:
 * each match consumes ONE space of each flanking pair, leaving the outer
 * space to flank the next site, and the single-space-bounded replacement
 * restores the invariant ("  a  b  a  b  " → "  ab  ab  ", while the
 * overlapping "  a  a  a  " → "  aa  a  " is the correct greedy BPE
 * application). Pair counts are integer word-frequency sums; the argmax
 * tie-breaks (count desc, pair asc) — fully deterministic, so a SQL
 * engine replays training bit-for-bit (oracle `bpe_merges`).
 */
object BpeTokenizer {

  final case class Merge(step: Int, pair: String, count: Long)

  /** "  c1  c2  ...  " — characters two-space-joined, space-wrapped. */
  private def initialSym(w: Column): Column =
    concat(lit("  "), array_join(split(w, ""), "  "), lit("  "))

  /** Symbol array of a sym string. */
  def symbols(sym: Column): Column = split(trim(sym), "  ")

  /** Adjacent symbol pairs as "a b" strings (the merge-candidate
    * multiset; one entry per position, standard BPE counting). */
  private def adjacentPairs(arr: Column): Column =
    when(size(arr) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(arr) - 2),
        i => concat(element_at(arr, i + 1), lit(" "),
          element_at(arr, i + 2))))

  /** Apply one merge to a sym column (see class doc for why plain
    * replace over the two-space representation is exact greedy BPE). */
  def applyMerge(sym: Column, pair: String): Column = {
    val Array(a, b) = pair.split(' ') // symbols never contain spaces
    replace(sym, lit(s" $a  $b "), lit(s" ${a + b} "))
  }

  /** Train `k` merges over the word vocabulary of `textCol`.
    * Returns (merges in training order, final word→sym vocabulary).
    *
    * 100 TB shape: ONE corpus pass builds (word, freq); each of the k
    * iterations is one map-side-combined aggregation over that
    * vocabulary table plus a driver-side top-1 (count desc, pair asc),
    * and one projection to apply the merge. The corpus is never touched
    * again — exactly how production corpus-level BPE trainers scale.
    *
    * r06: the vocabulary is materialized ONCE via localCheckpoint and
    * each iteration's sym column is the merge-replace chain applied as
    * an expression over it — the r05 loop re-persisted and force-counted
    * a new cache generation per merge (k extra jobs), and plan-keyed
    * cache entries risked surviving into a caller's next invocation.
    * localCheckpoint storage is instance-keyed, so repeated runs always
    * recompute (nothing leaks across bench reps) and callers have no
    * unpersist bookkeeping. */
  def train(docs: DataFrame, textCol: String, k: Int)
      : (Seq[Merge], DataFrame) = {
    val v0 = docs
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("sym", initialSym(col("w")))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var sym: Column = col("sym")
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val top = v0
        .select(col("freq"),
          explode(adjacentPairs(symbols(sym))).as("pr"))
        .groupBy("pr").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pr").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        merges += Merge(step, pair, top(0).getLong(1))
        sym = applyMerge(sym, pair)
        step += 1
      }
    }
    (merges.toSeq, v0.withColumn("sym", sym))
  }
}
