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
  * Driver-side, metadata-sized: entries live in memory already; the index
  * is one sort + one groupBy over the delete entries. Queries are safe to
  * issue from parallel planning loops: the equality-suffix memo is a
  * concurrent map over structurally-shared list tails and the range-check
  * counter is atomic.
  */
private[table] final class DeleteIndex(deleteEntries: Seq[ManifestEntry]) {
  import DeleteIndex._

  private val (eqRaw, allPos) = deleteEntries.partition(_.dataFile.content == 2)
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

  private val eqBySeq: Array[ManifestEntry] = eqRaw.toArray.sortBy(seqOf)
  // one cons-list, built once: every memoized suffix is a TAIL of this list,
  // so the memo holds O(distinct start indexes) pointers, not copies
  private val eqPairsList: List[(DataFile, Long)] =
    eqBySeq.iterator.map(d => (d.dataFile, seqOf(d))).toList
  private val eqSuffixes =
    new java.util.concurrent.ConcurrentHashMap[Int, List[(DataFile, Long)]]()

  /** Bounds evaluations against range-scoped delete files — test hook
    * asserting the index short-circuits (file-scoped deletes never scan).
    */
  val rangedBoundsChecks = new java.util.concurrent.atomic.AtomicLong(0L)

  def isEmpty: Boolean = deleteEntries.isEmpty

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
    * must not be re-deleted). Memoized per distinct start index; each memo
    * entry is a shared tail of [[eqPairsList]] (O(1) extra memory), so the
    * cache is O(M + distinct data sequences) however many files plan.
    */
  def eqDeletesFor(dseq: Long): Seq[(DataFile, Long)] = {
    if (eqBySeq.isEmpty) return Nil
    val from = lowerBound(eqSeqs, dseq, strict = true)
    eqSuffixes.computeIfAbsent(from, f => eqPairsList.drop(f))
  }
}

private[table] object DeleteIndex {
  /** Reserved field ID of the `file_path` column in positional-delete
    * files (Iceberg spec §position-delete-files).
    */
  val PathFieldId = 2147483546
}
