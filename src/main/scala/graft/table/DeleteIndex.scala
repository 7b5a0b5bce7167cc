package graft.table

import graft.core.{Bounds, IceString}
import graft.meta.{DataFile, ManifestEntry}

/** Index over a snapshot's delete manifest entries so planning matches
  * deletes to data files in O((N+M) log M) instead of the naive
  * O(N·M) nested loop (reference `matchDeletesToData`
  * `table/scanner.go:285-309` binary-searches a sequence-sorted delete
  * list; we additionally hash path-pinned entries).
  *
  * Three disjoint structures, each keyed for its matching rule:
  *   - deletion vectors: exact `referenced_data_file` pointer → hash map
  *     keyed by path, bucket sorted by sequence number;
  *   - file-scoped positional deletes (decoded `file_path` bounds with
  *     lower == upper): the bound IS the single target path — provably
  *     untruncated, since `Bounds.truncateUpper` always increments the
  *     last unit when it truncates — so they hash exactly like DVs;
  *   - range-scoped positional deletes: sequence-sorted array; per data
  *     file, binary search for the first applicable sequence number and
  *     bounds-check only the suffix;
  *   - equality deletes: sequence-sorted array with memoized suffixes
  *     (the applicable set depends only on the data sequence number, so
  *     N data files share at most M distinct suffixes).
  *
  * Equality deletes come in two scopes (Iceberg spec §scan-planning): a
  * delete written under an UNPARTITIONED spec (incl. the synthetic
  * global-deletes spec) applies to every strictly-older data file; a
  * delete written under a PARTITIONED spec applies only to data files of
  * the SAME spec and the SAME partition tuple. Scoped entries index by
  * (specId, tuple) so a partitioned upsert sink's accumulated delete
  * files stop anti-joining against every partition's scans — only the
  * key's own partition pays (r18 verdict item 2).
  *
  * Driver-side, metadata-sized: entries live in memory already; the index
  * is one sort + one groupBy over the delete entries. Queries are safe to
  * issue from parallel planning loops: the equality-suffix memos are
  * concurrent maps over structurally-shared list tails and the
  * range-check counter is atomic.
  */
private[table] final class DeleteIndex(keyedEntries: Seq[DeleteIndex.Keyed]) {
  import DeleteIndex._

  private val (eqRawKeyed, allPosKeyed) =
    keyedEntries.partition(_.entry.dataFile.content == 2)
  private val allPos = allPosKeyed.map(_.entry)
  private val (dvRaw, posRaw) = allPos.partition(_.dataFile.isDeletionVector)

  private def seqOf(e: ManifestEntry): Long = e.sequenceNumber.getOrElse(0L)

  private val dvByPath: Map[String, Array[ManifestEntry]] =
    dvRaw.groupBy(_.dataFile.referencedDataFile.get)
      .view.mapValues(_.toArray.sortBy(seqOf)).toMap

  // decode path bounds ONCE at index build (the naive loop re-decoded the
  // UTF-8 bytes for every data×delete pair)
  private final case class PosEntry(lo: Option[String], hi: Option[String],
      seq: Long, file: DataFile)
  private val posDecoded: Seq[PosEntry] = posRaw.map { d =>
    PosEntry(
      d.dataFile.lowerBounds.get(PathFieldId).map(new String(_, "UTF-8")),
      d.dataFile.upperBounds.get(PathFieldId).map(new String(_, "UTF-8")),
      seqOf(d), d.dataFile)
  }
  // lo == hi admits exactly one path ONLY for spec-conforming writers:
  // `truncateUpper` must increment the last unit when it truncates, so an
  // equal pair is provably untruncated. A non-conforming writer that
  // truncates both bounds without the increment would land here and have
  // its deletes matched to the truncated prefix only; our own writer
  // records untruncated `file_path` bounds (DataWriter), and foreign
  // delete files enter only via addFiles, which does not import deletes.
  private val (posExactRaw, posRangedRaw) =
    posDecoded.partition(p => p.lo.isDefined && p.lo == p.hi)
  private val posExactByPath: Map[String, Array[PosEntry]] =
    posExactRaw.groupBy(_.lo.get).view.mapValues(_.toArray.sortBy(_.seq)).toMap
  private val posRanged: Array[PosEntry] = posRangedRaw.toArray.sortBy(_.seq)
  private val EmptyPos = Array.empty[PosEntry]
  private val EmptyEntries = Array.empty[ManifestEntry]

  // global = written under an unpartitioned spec; scoped = partitioned
  // spec AND a tuple, indexed by (specId, tuple). A partitioned-spec entry
  // with NO tuple is malformed — the Iceberg spec scopes such deletes to
  // spec AND tuple, so without the tuple there is no lawful match set —
  // and it applies to NOTHING: matching it globally would be the unsafe
  // direction (a genuinely scoped delete applied table-wide over-deletes
  // equal-key rows in other partitions). Unreachable via this repo's
  // writers (upsert always records tuples; addFiles imports no deletes) —
  // this guards foreign v2/v3 metadata.
  private val (eqScopedKeyed, eqRest) = eqRawKeyed.partition(k =>
    k.partitionedSpec && k.entry.dataFile.partition.nonEmpty)
  private val eqGlobalKeyed = eqRest.filterNot(_.partitionedSpec)
  private val eqBySeq: Array[ManifestEntry] =
    eqGlobalKeyed.map(_.entry).toArray.sortBy(seqOf)
  // one cons-list, built once: every memoized suffix is a TAIL of this list,
  // so the memo holds O(distinct start indexes) pointers, not copies
  private val eqPairsList: List[(DataFile, Long)] =
    eqBySeq.iterator.map(d => (d.dataFile, seqOf(d))).toList
  private val eqSuffixes =
    new java.util.concurrent.ConcurrentHashMap[Int, List[(DataFile, Long)]]()

  private val eqScoped: Map[(Int, Seq[Any]), ScopedGroup] =
    eqScopedKeyed.groupBy(k => (k.specId, tupleKey(k.entry.dataFile.partition)))
      .view.mapValues { ks =>
        val sorted = ks.map(_.entry).toArray.sortBy(seqOf)
        ScopedGroup(sorted.map(seqOf),
          sorted.iterator.map(d => (d.dataFile, seqOf(d))).toList,
          new java.util.concurrent.ConcurrentHashMap())
      }.toMap

  /** Bounds evaluations against range-scoped delete files — test hook
    * asserting the index short-circuits (file-scoped deletes never scan).
    */
  val rangedBoundsChecks = new java.util.concurrent.atomic.AtomicLong(0L)

  def isEmpty: Boolean = keyedEntries.isEmpty

  /** First index in `seqs` with value >= (or > when `strict`) `target`. */
  private def lowerBound(seqs: Array[Long], target: Long, strict: Boolean): Int = {
    var lo = 0
    var hi = seqs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (if (strict) seqs(mid) <= target else seqs(mid) < target) lo = mid + 1
      else hi = mid
    }
    lo
  }
  private val posRangedSeqs: Array[Long] = posRanged.map(_.seq)
  private val eqSeqs: Array[Long] = eqBySeq.map(seqOf)

  /** Positional deletes applying to data file `path` at data sequence
    * `dseq`: delete.seq >= data.seq and path within the delete file's
    * `file_path` bounds. Upper bounds may be truncated (16-unit metrics
    * mode), hence the `startsWith` admit — conservative, the anti-join
    * simply finds no rows for a false positive.
    */
  def posDeletesFor(path: String, dseq: Long): Seq[DataFile] = {
    val exact = posExactByPath.getOrElse(path, EmptyPos)
      .collect { case p if p.seq >= dseq => p.file }
    val from = lowerBound(posRangedSeqs, dseq, strict = false)
    val ranged = collection.mutable.ArrayBuffer[DataFile]()
    var i = from
    while (i < posRanged.length) {
      val p = posRanged(i)
      rangedBoundsChecks.incrementAndGet()
      // code-point order, not String.compareTo: the bounds were written in
      // UTF-8 byte order (= code-point order), and UTF-16 code-unit order
      // disagrees for supplementary-plane chars — a path with one would
      // compare above a truncated upper bound that actually admits it
      if (p.lo.forall(Bounds.compare(IceString, _, path) <= 0) &&
          p.hi.forall(h => Bounds.compare(IceString, path, h) <= 0 ||
            path.startsWith(h)))
        ranged += p.file
      i += 1
    }
    exact.toSeq ++ ranged
  }

  /** Deletion vectors referencing `path` with delete.seq >= data.seq —
    * the pointer is the match, no bounds heuristics.
    */
  def dvsFor(path: String, dseq: Long): Seq[DataFile] =
    dvByPath.getOrElse(path, EmptyEntries)
      .collect { case e if seqOf(e) >= dseq => e.dataFile }.toSeq

  /** Equality deletes applying at data sequence `dseq` — STRICTLY newer
    * only (Iceberg spec: rows (re)written in the same or a later commit
    * must not be re-deleted). Global scope: every data file. Memoized per
    * distinct start index; each memo entry is a shared tail of
    * [[eqPairsList]] (O(1) extra memory), so the cache is O(M + distinct
    * data sequences) however many files plan.
    */
  def eqDeletesFor(dseq: Long): Seq[(DataFile, Long)] = {
    if (eqBySeq.isEmpty) return Nil
    val from = lowerBound(eqSeqs, dseq, strict = true)
    eqSuffixes.computeIfAbsent(from, f => eqPairsList.drop(f))
  }

  /** Equality deletes applying to a data file at sequence `dseq` written
    * under spec `specId` with partition tuple `partition`: the global set
    * plus the scoped set of exactly (specId, tuple) — a scoped delete in
    * any other partition never reaches this file's anti-join.
    */
  def eqDeletesFor(dseq: Long, specId: Int,
      partition: Seq[Any]): Seq[(DataFile, Long)] = {
    val global = eqDeletesFor(dseq)
    if (eqScoped.isEmpty) return global
    eqScoped.get((specId, tupleKey(partition))) match {
      case None => global
      case Some(g) =>
        val from = lowerBound(g.seqs, dseq, strict = true)
        val scoped = g.suffixes.computeIfAbsent(from, f => g.pairsList.drop(f))
        if (global.isEmpty) scoped else global ++ scoped
    }
  }
}

private[table] object DeleteIndex {
  /** Reserved field ID of the `file_path` column in positional-delete
    * files (Iceberg spec §position-delete-files).
    */
  val PathFieldId = 2147483546

  /** A delete manifest entry plus the facts partition-scope matching needs
    * from its owning manifest: the spec id and whether that spec is
    * partitioned (GlobalDeletes and unpartitioned specs are not).
    */
  final case class Keyed(entry: ManifestEntry, specId: Int, partitionedSpec: Boolean)

  /** Value-equality key over a partition tuple: byte arrays compare by
    * reference in JVM equality, so they canonicalize to Seq[Byte].
    */
  def tupleKey(p: Seq[Any]): Seq[Any] =
    p.map { case b: Array[Byte] => b.toSeq; case x => x }

  /** Index over entries with no partition scoping (every equality delete
    * global) — the pre-scoping shape, kept for specs and probes.
    */
  def unscoped(entries: Seq[ManifestEntry]): DeleteIndex =
    new DeleteIndex(entries.map(Keyed(_, 0, partitionedSpec = false)))

  private[table] final case class ScopedGroup(seqs: Array[Long],
      pairsList: List[(DataFile, Long)],
      suffixes: java.util.concurrent.ConcurrentHashMap[Int, List[(DataFile, Long)]])
}
