package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data curation operators beyond per-doc text analysis: benchmark
  * decontamination, repetition (boilerplate) filtering, sequence packing for
  * batch construction, and mixture capping — the remaining stages of a
  * 100 TB pretraining-data pipeline (dedup lives in Dedup.scala, quality /
  * language ops in TextOps.scala).
  *
  * Scale notes per operator are on each def; the common theme: the only
  * shuffles are keyed on high-cardinality values (doc_id, n-gram) or on the
  * pipeline's natural blocking key (source), and the benchmark side of
  * decontamination is broadcast — never a corpus self-join.
  */
object PipelineOps {
  import QueryDef.t

  /** Normalized word array (same normalization as every Dedup operator). */
  private def words: Column =
    Tok.words(col("text"))

  /** Distinct word n-grams over a pre-materialized `words` column. */
  private def distinctGrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace token count — portable char-count identity (TextOps). */
  private def tokenCount: Column = {
    val txt = col("text")
    (length(txt) - length(regexp_replace(txt, lit(" "), lit(""))) + lit(1)).cast(LongType)
  }

  /** Benchmark decontamination: corpus documents sharing any word 5-gram
    * with a held-out benchmark set (here: doc_id < 50). The industry-standard
    * n-gram-overlap check before training.
    *
    * 100 TB shape: the benchmark gram set is bounded by the BENCHMARK size
    * (a few thousand docs however big the corpus), so it broadcasts; the
    * corpus side streams through one exploded pass with a map-side hash
    * join — no shuffle touches corpus text, and the only wide exchange is
    * the final groupBy on doc_id (high-cardinality, no skew).
    */
  def decontaminate(documents: org.apache.spark.sql.DataFrame,
      benchMaxId: Long): org.apache.spark.sql.DataFrame = {
    val docs = documents.select(col("doc_id"), words.as("w"))
    val g5 = docs.select(col("doc_id"),
      explode(distinctGrams(col("w"), 5)).as("gram"))
    val bench = g5.where(col("doc_id") < benchMaxId)
      .select(col("gram"), col("doc_id").as("bench_id")).distinct()
    g5.where(col("doc_id") >= benchMaxId)
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .select("doc_id", "n_shared_grams", "n_bench_docs")
  }

  /** Bloom-filter decontamination — the scale path of [[decontaminate]].
    * The exact variant broadcasts the benchmark's distinct 5-gram STRINGS;
    * fine for thousands of benchmark docs, but a large eval suite's gram
    * set reaches GBs, and a GB-scale broadcast hash join is what dies
    * first on a 1000-executor run. This variant collapses the benchmark
    * side into a Bloom sketch (~1.2 MB per million grams at 1% fpp),
    * probed by a native codegen expression — the corpus pass is a
    * streamed FILTER with no join at all, and only probable hits reach
    * the per-doc aggregate.
    *
    * One-sided error: a contaminated gram is NEVER missed (no false
    * negatives — PipelineOpsSpec pins exact ⊆ bloom). False positives
    * compound PER DOCUMENT: a clean doc with g distinct grams is flagged
    * with probability ≈ g·fpp, so the per-GRAM rate must be sized from the
    * per-DOC target — the fixed 20-bits/key, k=13 sizing
    * ([[graft.functions.GraftBloom]]) holds the gram-level rate near 1e-4
    * (doc-level noise ≈ 1% for ~100-gram docs) at 2.5 MB of sketch per
    * million benchmark grams. The right deployment runs this as the cheap
    * first pass and the exact join only on the flagged survivors.
    *
    * Oracle-gated since r12: [[graft.functions.GraftBloom]]'s MD5 probe
    * positions are engine-portable, so the DuckDB oracle rebuilds the SAME
    * bit set and reproduces the false positives exactly — the sketch's
    * error pattern is part of the spec, not an engine accident.
    */
  def decontaminateBloom(documents: org.apache.spark.sql.DataFrame,
      benchMaxId: Long): org.apache.spark.sql.DataFrame = {
    val docs = documents.select(col("doc_id"), words.as("w"))
    val g5 = docs.select(col("doc_id"),
      explode(distinctGrams(col("w"), 5)).as("gram"))
    val bench = g5.where(col("doc_id") < benchMaxId).select("gram").distinct()
    // both actions touch only the BENCHMARK slice (eval-suite-sized however
    // big the corpus is) — same plan-time cost class as the IVF codebook fit
    val expected = math.max(bench.count(), 1L)
    val bloom = graft.functions.GraftBloom.build(bench, "gram", expected)
    g5.where(col("doc_id") >= benchMaxId)
      .where(graft.functions.BloomExprs.mightContain(col("gram"), bloom))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_flagged_grams"))
      .select("doc_id", "n_flagged_grams")
  }

  /** Gopher-style repetition signal: fraction of duplicated word 3-grams
    * per document (high fraction = boilerplate/spam). One explode + one
    * groupBy on doc_id; count and count-distinct aggregate in the same
    * pass, so the corpus is read once and no gram array is re-shuffled.
    */
  def repetition(documents: org.apache.spark.sql.DataFrame,
      flagAbove: Double): org.apache.spark.sql.DataFrame = {
    val docs = documents.select(col("doc_id"), words.as("w"))
    // NON-distinct grams: duplicates are the signal
    val grams = when(size(col("w")) >= 3,
      transform(sequence(lit(0), size(col("w")) - 3), i =>
        concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2), element_at(col("w"), i + 3))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), explode(grams).as("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("gram")).as("n_distinct_grams"))
      .withColumn("dup_gram_frac",
        round(lit(1.0) - col("n_distinct_grams").cast(DoubleType) /
          col("n_grams").cast(DoubleType), 4))
      .withColumn("is_repetitive", col("dup_gram_frac") > flagAbove)
      .select("doc_id", "n_grams", "n_distinct_grams", "dup_gram_frac",
        "is_repetitive")
  }

  /** Gopher-style document quality rules (the deterministic pre-filters a
    * pretraining pipeline runs before any model-based scoring): per-doc 0/1
    * flags for
    *   1. word count within [minWords, maxWords];
    *   2. mean word length within [3, 10] chars;
    *   3. at least 2 distinct stop words present (the natural-language
    *      signal);
    *   4. most frequent word at most 20% of the document (boilerplate/spam);
    * plus their conjunction. Every threshold is cross-multiplied so NO
    * division exists anywhere — the flags are integer-exact and the oracle
    * hash-matches bit-for-bit.
    *
    * 100 TB shape: one exploded pass; the (doc_id, token) term-frequency
    * pre-aggregate and the per-doc rollup are both map-side combinable,
    * keys are high-cardinality, and there are no joins and no UDFs.
    */
  def gopherRules(documents: org.apache.spark.sql.DataFrame,
      minWords: Long, maxWords: Long): org.apache.spark.sql.DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and", "in")
    val tf = documents
      .select(col("doc_id"), explode(words).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val rWc = col("n_words") >= minWords && col("n_words") <= maxWords
    val rMwl = col("n_word_chars") >= col("n_words") * 3 &&
      col("n_word_chars") <= col("n_words") * 10
    val rStop = col("n_stop") >= 2
    val rMaxTf = col("max_tf") * 5 <= col("n_words")
    tf.groupBy("doc_id").agg(
        sum(col("tf")).as("n_words"),
        sum(col("tf") * length(col("token"))).as("n_word_chars"),
        max(col("tf")).as("max_tf"),
        // grouped by (doc, token), so each distinct token contributes once
        sum(when(col("token").isInCollection(stop), 1L).otherwise(0L))
          .as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        rWc.cast(LongType).as("r_word_count"),
        rMwl.cast(LongType).as("r_mean_word_len"),
        rStop.cast(LongType).as("r_stop_words"),
        rMaxTf.cast(LongType).as("r_max_word_freq"),
        (rWc && rMwl && rStop && rMaxTf).cast(LongType).as("pass_gopher"))
  }

  /** Greedy sequential sequence packing: within each source (the pipeline's
    * shard key), documents in doc_id order accumulate into fixed-token-budget
    * packs — the batch-construction step before tokenizer sharding. The
    * window is partitioned on source, so the shuffle is one exchange on the
    * blocking key and each pack is built by a single task; packing is
    * inherently order-sequential, which is exactly what the per-source
    * window expresses.
    */
  def sequencePacking(documents: org.apache.spark.sql.DataFrame,
      packBudget: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col("source"), tokenCount.as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast(DoubleType) /
          lit(packBudget.toDouble)).cast(LongType).as("pack_id"))
  }

  /** Mixture capping: keep at most `cap` documents per source (doc_id order
    * — deterministic) and report the per-source before/after mix. The
    * down-weighting step that stops one dominant crawl source from washing
    * out the mixture. Same single source-keyed exchange as packing.
    */
  def sourceCap(documents: org.apache.spark.sql.DataFrame,
      cap: Int): org.apache.spark.sql.DataFrame = {
    val rn = row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    documents
      .select(col("doc_id"), col("source"), tokenCount.as("n_tokens"))
      .withColumn("rn", rn)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_total"),
        sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("rn") <= cap, col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .select("source", "n_docs_total", "n_docs_kept", "kept_tokens")
  }

  /** Hash-deterministic train/val/test split: the bucket derives from
    * md5(doc_id), not from row position or id modulo, so the assignment is
    * stable under resharding/reordering, unbiased for autoincrement-ish
    * ids, and reproducible on ANY engine that has md5 (the oracle proves
    * it). First hex nibble: 0-c train (13/16), d-e val (2/16), f test
    * (1/16). Pure per-row map — no shuffle; the summary is one agg.
    */
  def hashSplit(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nibble = substring(md5(col("doc_id").cast(StringType).cast(BinaryType)), 1, 1)
    documents.select(col("doc_id"),
      when(nibble <= "c", "train").when(nibble <= "e", "val")
        .otherwise("test").as("split"))
  }

  /** Exact stratified sample: within every source, keep the `frac` share
    * of documents with the SMALLEST md5(doc_id) — deterministic bottom-k
    * per stratum (quota = ceil(frac · stratum size)), stable under
    * resharding because selection depends only on ids, and reproducible on
    * any engine with md5 (the oracle re-derives the identical set).
    *
    * The naive plan — rank over a window partitioned by source — sorts
    * each whole stratum in ONE task, which is exactly what dies on a
    * 100 TB corpus where one crawl source dominates. Instead the quota
    * threshold is located through a BIN HISTOGRAM on the hash's first 3
    * hex chars (4096 bins, lexicographically consistent with full-hash
    * order): per-(source, bin) counts are a map-side-combinable aggregate
    * whose result is tiny (sources × 4096), the bins wholly under the
    * quota pass with a broadcast semi-join, and only the single BOUNDARY
    * bin per source — ~1/4096 of the stratum — pays a ranking window for
    * its residual rows. No full-stratum sort exists in the plan, so a
    * skewed stratum costs what a balanced one does.
    */
  def stratifiedSample(documents: org.apache.spark.sql.DataFrame,
      frac: Double): org.apache.spark.sql.DataFrame = {
    val h = md5(col("doc_id").cast(StringType).cast(BinaryType))
    val docs = documents.select(col("doc_id"), col("source"), h.as("h"),
      substring(h, 1, 3).as("bin"))
    val wcum = Window.partitionBy("source")
      .orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binStats = docs.groupBy("source", "bin").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("quota",
        ceil(lit(frac) * sum(col("c")).over(Window.partitionBy("source")))
          .cast(LongType))
    val fullBins = binStats.where(col("cum") <= col("quota"))
      .select("source", "bin")
    val boundary = binStats
      .where(col("cum") - col("c") < col("quota") && col("cum") > col("quota"))
      .select(col("source"), col("bin"),
        (col("quota") - (col("cum") - col("c"))).as("need"))
    val wbin = Window.partitionBy("source", "bin").orderBy(col("h"), col("doc_id"))
    docs.join(broadcast(fullBins), Seq("source", "bin"), "left_semi")
      .select("doc_id", "source")
      .unionByName(docs.join(broadcast(boundary), Seq("source", "bin"))
        .withColumn("rn", row_number().over(wbin))
        .where(col("rn") <= col("need"))
        .select("doc_id", "source"))
  }

  /** Model-based quality scoring: a multinomial Naive Bayes classifier
    * trained from WEAK labels (docs of `goodSources` = positive, the rest
    * negative — the fastText-quality-filter recipe: label by provenance,
    * score everything) and applied back to every document as a token
    * log-odds sum. The heuristic signals (TextOps quality) rank by surface
    * statistics; this learns which WORDS distinguish the trusted slice.
    *
    * Everything trains in ONE aggregation pass: per-token class counts are
    * a map-side-combinable groupBy(token), class totals and vocabulary size
    * one tiny agg, priors one tiny agg — no iteration, no driver-side data.
    * Scoring joins the per-token log-ratio back on the token explode
    * (vocabulary-scale shuffle join) and reduces per doc.
    *
    * Determinism (r12): each per-token log-likelihood ratio is rounded to
    * INTEGER micro-units (1e-4) the moment it leaves ln(), so the per-doc
    * reduction is an exact integer SUM — order-independent (plain
    * map-side-combinable aggregation, no sorted-fold workaround) and
    * restatable bit-for-bit by the DuckDB oracle: both engines' ln() agree
    * to ≲2 ulp on integer inputs, and the 1e-4 rounding absorbs that
    * everywhere except a measure-zero boundary coincidence. The final
    * log_odds is ONE IEEE division of two exact integers.
    */
  def nbQualityScores(documents: org.apache.spark.sql.DataFrame,
      goodSources: Seq[String]): org.apache.spark.sql.DataFrame = {
    val toks = documents.select(col("doc_id"), col("source"),
      explode(words).as("token"))
    val labeled = toks.withColumn("y", col("source").isin(goodSources: _*))
    val counts = labeled.groupBy("token").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("c0"))
    val totals = counts.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
      count(lit(1)).as("v"))
    // Laplace-smoothed per-token log-likelihood ratio, in integer micro-units
    val lr = counts.join(broadcast(totals))
      .select(col("token"),
        round((log((col("c1") + 1).cast(DoubleType)) -
          log((col("n1") + col("v")).cast(DoubleType)) -
          log((col("c0") + 1).cast(DoubleType)) +
          log((col("n0") + col("v")).cast(DoubleType))) * lit(1e4))
          .cast(LongType).as("lr_micro"))
    val prior = documents.agg(
      round((log(sum(when(col("source").isin(goodSources: _*), 1L).otherwise(0L))
          .cast(DoubleType)) -
        log(sum(when(!col("source").isin(goodSources: _*), 1L).otherwise(0L))
          .cast(DoubleType))) * lit(1e4))
        .cast(LongType).as("prior_micro"))
    toks.join(lr, "token")
      .groupBy("doc_id")
      .agg(sum(col("lr_micro")).as("sum_micro"))
      .join(broadcast(prior))
      .withColumn("score_micro", col("prior_micro") + col("sum_micro"))
      .select(col("doc_id"),
        (col("score_micro").cast(DoubleType) / lit(1e4)).as("log_odds"),
        (col("score_micro") > 0L).cast(LongType).as("predicted_good"))
  }

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrubbing: count and redact email/phone patterns per document —
    * the pre-training privacy pass. Pure per-row map (no shuffle at all);
    * the oracle verifies the REDACTED text via its fingerprint, so the
    * replacement semantics are exactly checked, not just the counts.
    */
  def piiScrub(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailPat, "<EMAIL>"), PhonePat, "<PHONE>")
    documents.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0)))
        .cast(LongType).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhonePat), lit(0)))
        .cast(LongType).as("n_phones"),
      length(redacted).cast(LongType).as("redacted_chars"),
      substring(md5(redacted.cast(BinaryType)), 1, 16).as("redacted_fingerprint"))
  }

  /** Mixture weighting: turn per-source token inventories into a concrete
    * sampling plan against a global token budget — the mixture-design step
    * between corpus profiling and sequence packing. The target is a uniform
    * budget share per source (integer split, remainder to the
    * lexicographically first sources); a source that cannot fill its target
    * even at `maxEpochs` repetitions contributes maxEpochs×inventory and
    * reports the shortfall rather than silently redistributing it
    * (redistribution is a policy choice; the report is the mechanism).
    *
    * Determinism discipline: inventories, targets, effective tokens, and
    * shortfalls stay integral end-to-end; `epochs` and `share` are each ONE
    * IEEE double division of two exact integers — hash-stable cross-engine.
    *
    * Scale shape: corpus rows are touched once by a map-side-combinable
    * groupBy on the tiny source key; every window below runs over
    * n_sources rows, never corpus rows.
    */
  def mixtureWeights(documents: org.apache.spark.sql.DataFrame,
      budget: Long, maxEpochs: Int): org.apache.spark.sql.DataFrame = {
    val perSource = documents
      .select(col("source"), tokenCount.as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("inventory_tokens"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lex = Window.orderBy("source")
    perSource
      .withColumn("n_sources", count(lit(1)).over(all))
      .withColumn("target_tokens",
        // `div`, not `/`: Spark's `/` on integral operands is true (double)
        // division, and the targets must stay exact BIGINTs
        expr(s"${budget}L div n_sources") +
          when(row_number().over(lex) <= lit(budget) % col("n_sources"), 1L)
            .otherwise(0L))
      .withColumn("effective_tokens",
        least(col("target_tokens"), lit(maxEpochs.toLong) * col("inventory_tokens")))
      .withColumn("shortfall_tokens", col("target_tokens") - col("effective_tokens"))
      .withColumn("epochs",
        col("effective_tokens").cast(DoubleType) /
          col("inventory_tokens").cast(DoubleType))
      .withColumn("share",
        // an all-empty corpus (every source at zero inventory) would make
        // this 0/0 = NaN; report zero shares instead
        when(sum(col("effective_tokens")).over(all) > 0L,
          col("effective_tokens").cast(DoubleType) /
            sum(col("effective_tokens")).over(all).cast(DoubleType))
          .otherwise(lit(0.0)))
      .select("source", "n_docs", "inventory_tokens", "target_tokens",
        "effective_tokens", "shortfall_tokens", "epochs", "share")
  }

  val defs: Seq[QueryDef] = Seq(
    // Gopher-style rule filter — integer-exact flags (no division anywhere)
    QueryDef(
      "pipeline_gopher_rules",
      (s, dir) => gopherRules(t(s, dir, "documents"),
        minWords = 30L, maxWords = 50000L),
      Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
          FROM toks GROUP BY doc_id, token),
        d AS (SELECT doc_id,
            SUM(tf) AS n_words,
            SUM(tf * length(token)) AS n_word_chars,
            MAX(tf) AS max_tf,
            SUM(CASE WHEN token IN ('the','a','of','to','and','in')
                THEN 1 ELSE 0 END) AS n_stop
          FROM tf GROUP BY doc_id)
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
          CAST(n_words BETWEEN 30 AND 50000 AS BIGINT) AS r_word_count,
          CAST(n_word_chars BETWEEN 3*n_words AND 10*n_words AS BIGINT)
            AS r_mean_word_len,
          CAST(n_stop >= 2 AS BIGINT) AS r_stop_words,
          CAST(5*max_tf <= n_words AS BIGINT) AS r_max_word_freq,
          CAST((n_words BETWEEN 30 AND 50000)
            AND (n_word_chars BETWEEN 3*n_words AND 10*n_words)
            AND n_stop >= 2 AND 5*max_tf <= n_words AS BIGINT) AS pass_gopher
        FROM d""")),

    QueryDef(
      "pipeline_mixture_weights",
      (s, dir) => mixtureWeights(t(s, dir, "documents"),
        budget = 100000L, maxEpochs = 4),
      Some("""
        WITH inv AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
              AS BIGINT) AS inventory_tokens
          FROM documents GROUP BY source),
        tgt AS (
          SELECT *,
            CAST(100000 // (COUNT(*) OVER ()) +
              CASE WHEN ROW_NUMBER() OVER (ORDER BY source)
                        <= 100000 % (COUNT(*) OVER ()) THEN 1 ELSE 0 END
              AS BIGINT) AS target_tokens
          FROM inv),
        eff AS (
          SELECT *, LEAST(target_tokens, 4 * inventory_tokens) AS effective_tokens
          FROM tgt)
        SELECT source, n_docs, inventory_tokens, target_tokens,
          CAST(effective_tokens AS BIGINT) AS effective_tokens,
          CAST(target_tokens - effective_tokens AS BIGINT) AS shortfall_tokens,
          CAST(effective_tokens AS DOUBLE) / CAST(inventory_tokens AS DOUBLE) AS epochs,
          CAST(effective_tokens AS DOUBLE) /
            CAST(SUM(effective_tokens) OVER () AS DOUBLE) AS share
        FROM eff""")),

    QueryDef(
      "pipeline_split",
      (s, dir) => hashSplit(t(s, dir, "documents")),
      Some("""
        SELECT doc_id,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
               ELSE 'test' END AS split
        FROM documents""")),

    // NB quality classifier — oracle-gated since r12: per-token log-ratios
    // round to integer micro-units before the (now order-independent)
    // per-doc sum, so the DuckDB restatement hash-matches; separation/
    // determinism stay pinned in PipelineOpsSpec
    QueryDef(
      "pipeline_quality_classifier",
      (s, dir) => nbQualityScores(QueryDef.spread(t(s, dir, "documents")),
        goodSources = (0 to 4).map(i => s"src$i")),
      Some("""
        WITH toks AS (SELECT doc_id, source, unnest(string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS token
          FROM documents),
        lab AS (SELECT doc_id, token,
            source IN ('src0','src1','src2','src3','src4') AS y FROM toks),
        counts AS (SELECT token,
            SUM(CASE WHEN y THEN 1 ELSE 0 END) AS c1,
            SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS c0
          FROM lab GROUP BY token),
        tot AS (SELECT SUM(c1) AS n1, SUM(c0) AS n0, COUNT(*) AS v FROM counts),
        lr AS (SELECT token,
            CAST(round((ln(c1 + 1) - ln(n1 + v) - ln(c0 + 1) + ln(n0 + v))
              * 10000) AS BIGINT) AS lr_micro
          FROM counts, tot),
        pr AS (SELECT CAST(round((
            ln(SUM(CASE WHEN source IN ('src0','src1','src2','src3','src4')
                   THEN 1 ELSE 0 END)) -
            ln(SUM(CASE WHEN source NOT IN ('src0','src1','src2','src3','src4')
                   THEN 1 ELSE 0 END))) * 10000) AS BIGINT) AS prior_micro
          FROM documents),
        s AS (SELECT t.doc_id, SUM(lr.lr_micro) AS sum_micro
          FROM toks t JOIN lr USING (token) GROUP BY t.doc_id)
        SELECT s.doc_id,
          CAST(sum_micro + prior_micro AS DOUBLE) / 10000 AS log_odds,
          CAST(sum_micro + prior_micro > 0 AS BIGINT) AS predicted_good
        FROM s, pr""")),

    // Bloom scale path of decontamination — oracle-gated since r12: the
    // portable MD5 probe spec lets DuckDB rebuild the identical bit set
    // (bench probe positions) and restate membership as an all-k-probes-hit
    // join, reproducing even the false positives. PipelineOpsSpec keeps the
    // one-sided-error pin against the exact join
    QueryDef(
      "pipeline_decontaminate_bloom",
      (s, dir) => decontaminateBloom(t(s, dir, "documents"), benchMaxId = 50L),
      Some(s"""
        WITH w AS (SELECT doc_id, string_split(
            regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS ws FROM documents),
        g AS (SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, len(ws) - 4),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                 ws[i+3] || ' ' || ws[i+4]))) AS gram FROM w),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50),
        nn AS (SELECT greatest(64, ${graft.functions.GraftBloom.BitsPerKey} * COUNT(*)) AS m
          FROM bench),
        hp AS (SELECT gram,
            CAST(('0x' || substr(md5(gram),1,8)) AS BIGINT) & 2147483647 AS h1,
            CAST(('0x' || substr(md5(gram),9,8)) AS BIGINT) & 2147483647 AS h2
          FROM (SELECT DISTINCT gram FROM g)),
        bench_pos AS (SELECT DISTINCT (h.h1 + u.i*h.h2) % nn.m AS pos
          FROM bench b JOIN hp h USING (gram), nn,
            unnest(range(0, ${graft.functions.GraftBloom.NumHashes})) AS u(i)),
        probes AS (SELECT g.doc_id, g.gram, (h.h1 + u.i*h.h2) % nn.m AS pos
          FROM g JOIN hp h USING (gram), nn,
            unnest(range(0, ${graft.functions.GraftBloom.NumHashes})) AS u(i)
          WHERE g.doc_id >= 50),
        hits AS (SELECT doc_id, gram, COUNT(*) AS c
          FROM probes JOIN bench_pos USING (pos) GROUP BY doc_id, gram)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged_grams
        FROM hits WHERE c = ${graft.functions.GraftBloom.NumHashes}
        GROUP BY doc_id""")),

    QueryDef(
      "pipeline_sample",
      (s, dir) => stratifiedSample(t(s, dir, "documents"), 0.1),
      Some("""
        WITH d AS (SELECT doc_id, source,
            md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        q AS (SELECT source, CAST(ceil(0.1 * COUNT(*)) AS BIGINT) AS quota
              FROM d GROUP BY source),
        r AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
              FROM d)
        SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        WHERE rn <= quota""")),

    QueryDef(
      "pipeline_pii_scrub",
      (s, dir) => piiScrub(t(s, dir, "documents")),
      Some("""
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text,
            '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS n_phones,
          CAST(length(redacted) AS BIGINT) AS redacted_chars,
          substr(md5(redacted), 1, 16) AS redacted_fingerprint
        FROM (
          SELECT doc_id, text, regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS redacted
          FROM documents) sub""")),
    QueryDef(
      "pipeline_decontaminate",
      // spread: the 5-gram shingle transform dominates and a single-split
      // input serializes it on one core (QueryDef.spread)
      (s, dir) => decontaminate(QueryDef.spread(t(s, dir, "documents")),
        benchMaxId = 50L),
      Some("""
        WITH w AS (
          SELECT doc_id, string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ws
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, len(ws) - 4),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                 ws[i+3] || ' ' || ws[i+4]))) AS gram
          FROM w WHERE len(ws) >= 5),
        b AS (SELECT DISTINCT gram, doc_id AS bench_id FROM g WHERE doc_id < 50),
        c AS (SELECT doc_id, gram FROM g WHERE doc_id >= 50)
        SELECT c.doc_id,
          CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS n_shared_grams,
          CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
        FROM c JOIN b USING (gram) GROUP BY c.doc_id""")),

    QueryDef(
      "text_repetition",
      (s, dir) => repetition(QueryDef.spread(t(s, dir, "documents")),
        flagAbove = 0.2),
      Some("""
        WITH w AS (
          SELECT doc_id, string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ws
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(ws) - 2),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
          FROM w WHERE len(ws) >= 3)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
          CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct_grams,
          ROUND(1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*), 4)
            AS dup_gram_frac,
          ROUND(1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*), 4) > 0.2
            AS is_repetitive
        FROM g GROUP BY doc_id""")),

    QueryDef(
      "pipeline_seq_packing",
      (s, dir) => sequencePacking(t(s, dir, "documents"), packBudget = 8192),
      Some("""
        SELECT doc_id, source, n_tokens,
          CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 8192.0) AS BIGINT) AS pack_id
        FROM (
          SELECT doc_id, source,
            CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
            SUM(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT))
              OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM documents) sub""")),

    QueryDef(
      "pipeline_source_cap",
      (s, dir) => sourceCap(t(s, dir, "documents"), cap = 15),
      Some("""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_total,
          CAST(SUM(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
          CAST(SUM(CASE WHEN rn <= 15 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        FROM (
          SELECT source,
            CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
            row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents) sub
        GROUP BY source"""))
  )
}
