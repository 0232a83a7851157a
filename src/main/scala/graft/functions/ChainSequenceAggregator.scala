package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One block's linkage view: its height, its id, and the id it claims as
  * parent (reference `BlockSequence` input, src/blockchain/block_seq.rs:36-42).
  */
case class BlockLink(height: Long, blockId: String, parentId: String)

/** A verified contiguous chain segment [startH..endH] whose internal links
  * all checked out; `startParent` is what the segment's first block claims
  * as parent (used to link the previous segment), `endBlockId` is the hash
  * the next segment must claim.
  */
case class ChainSegment(
    startH: Long, startParent: String,
    endH: Long, endBlockId: String)

case class ChainBuf(segments: List[ChainSegment])

/** Chain-fold verdict: whether [minH..maxH] is one unbroken parent-linked
  * sequence, plus the heights where linkage breaks (gap or hash mismatch —
  * the reference's BlockSequence walk, src/blockchain/block_seq.rs:58-180,
  * driven from verify at src/command/verify.rs:858-896).
  */
case class ChainVerdict(ok: Boolean, minH: Long, maxH: Long, breaks: Seq[Long])

/** Distributed chain-sequence verification as a typed Aggregator
  * (SURVEY.md §7 custom piece (b)): each partition folds its blocks into
  * maximal verified segments; merge stitches segments whose boundary
  * link matches. Unlike a global-order window, this reduces map-side and
  * never materializes the chain on one task. O(segments) state — bounded
  * by the number of breaks + partition boundaries, not by chain length.
  *
  * Assumes at most one block per height (dedup/fork-resolution upstream,
  * §2.3 semi-join-fork).
  */
object ChainSequenceAggregator
    extends Aggregator[BlockLink, ChainBuf, ChainVerdict] {

  override def zero: ChainBuf = ChainBuf(Nil)

  override def reduce(b: ChainBuf, a: BlockLink): ChainBuf =
    merge(b, ChainBuf(List(ChainSegment(a.height, a.parentId, a.height, a.blockId))))

  override def merge(x: ChainBuf, y: ChainBuf): ChainBuf = {
    // Merge two sorted segment lists, stitching adjacent segments when the
    // boundary link verifies. Segments that don't stitch yet stay separate
    // — a gap may still be filled by a later merge, so break positions are
    // only derived at finish time.
    val all = (x.segments ++ y.segments).sortBy(_.startH)
    val segs = all.foldLeft(List.empty[ChainSegment]) {
      case (Nil, s) => List(s)
      case (head :: tail, s) =>
        if (s.startH == head.endH + 1 && s.startParent == head.endBlockId)
          ChainSegment(head.startH, head.startParent, s.endH, s.endBlockId) :: tail
        else
          s :: head :: tail
    }
    ChainBuf(segs.reverse)
  }

  override def finish(b: ChainBuf): ChainVerdict = b.segments match {
    case Nil => ChainVerdict(ok = true, 0L, -1L, Nil)
    case segs =>
      // every surviving segment boundary is a real break: either a height
      // gap or a parent-hash mismatch
      ChainVerdict(
        ok = segs.size == 1,
        segs.head.startH, segs.last.endH,
        segs.tail.map(_.startH))
  }

  override def bufferEncoder: Encoder[ChainBuf] = Encoders.product[ChainBuf]
  override def outputEncoder: Encoder[ChainVerdict] = Encoders.product[ChainVerdict]
}
