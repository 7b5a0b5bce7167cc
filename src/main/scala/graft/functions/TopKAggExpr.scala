package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Bounded top-k by (score DESC, id ASC) as a native PARTIAL-AGGREGATING
  * aggregate — the scale-correct replacement for
  * `row_number().over(Window.partitionBy("query_id"))` in the ANN re-rank
  * paths.
  *
  * The window formulation shuffles every scored corpus×queries row into
  * nQueries partitions — at 5 queries that is 5 corpus-sized partitions,
  * and a large query batch makes each partition a full corpus scan on ONE
  * task. An aggregate, by contrast, participates in partial aggregation:
  * every map task reduces its slice to at most k entries per query BEFORE
  * the exchange, so the shuffle carries nTasks×nQueries×k bounded buffers
  * and the final merge per query is k-sized — the same
  * TakeOrderedAndProject discipline `text_vocab_topk` follows, applied
  * per group.
  *
  * Ordering contract: entries rank by (score desc, id asc) — bit-identical
  * to the `row_number` ordering it replaces, so oracle hashes are
  * unchanged. Null score/id rows are skipped.
  */
final case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.ResultType
  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score needs (double, bigint), got " +
        s"(${scoreExpr.dataType}, ${idExpr.dataType})")

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k)

  override def update(buffer: TopKByScore.Buffer,
      input: InternalRow): TopKByScore.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKByScore.Buffer,
      other: TopKByScore.Buffer): TopKByScore.Buffer = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKByScore.Buffer): Any = {
    val sorted = buffer.sortedBestFirst
    new GenericArrayData(sorted.map { case (score, id) =>
      InternalRow(id, score)
    })
  }

  override def serialize(buffer: TopKByScore.Buffer): Array[Byte] = {
    val entries = buffer.entries
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (score, id) => bb.putDouble(score); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScore.Buffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  /** Size-bounded top-k heap: the stored WORST entry is at the heap head,
    * so an offer against a full buffer is one compare (and one replace when
    * the candidate beats it). "Better" = higher score, tie → smaller id.
    */
  final class Buffer(k: Int) {
    // heap max (dequeue) = the entry to evict first: lowest score, then
    // LARGEST id — the exact inverse of the output ranking
    private val worstFirst: Ordering[(Double, Long)] =
      new Ordering[(Double, Long)] {
        def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
    private val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)

    def offer(score: Double, id: Long): Unit = {
      // comparator-based (never primitive <): java.lang.Double.compare
      // totally orders NaN as the LARGEST double, exactly like the SQL
      // descending sort this aggregate replaces — a primitive `score >`
      // would silently drop NaN candidates the window would have ranked.
      // The full-heap reject path runs once per scored row — compare
      // primitives BEFORE allocating the tuple
      if (heap.size < k) heap.enqueue((score, id))
      else {
        // replace iff the candidate beats the stored worst: higher score,
        // tie broken by smaller id (same predicate worstFirst encodes)
        val head = heap.head
        val c = java.lang.Double.compare(head._1, score)
        if (c < 0 || (c == 0 && id < head._2)) {
          heap.dequeue(); heap.enqueue((score, id))
        }
      }
    }

    def offer(e: (Double, Long)): Unit = offer(e._1, e._2)
    def foreach(f: ((Double, Long)) => Unit): Unit = heap.foreach(f)
    def entries: Array[(Double, Long)] = heap.toArray
    def sortedBestFirst: Array[(Double, Long)] = heap.toArray.sorted(worstFirst)
  }

  /** `top_k_by_score(score, id, k)` as a Column aggregate: array of
    * `struct<id, score>` ranked best-first; `posexplode` recovers the rank.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftShim.column(
      TopKByScore(GraftShim.expression(score), GraftShim.expression(id), k)
        .toAggregateExpression())
}
