package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra–Gries frequent-items sketch as a typed, MERGEABLE Aggregator —
  * the heavy-hitters companion to the HLL distinct sketch (q93): a
  * bounded `k`-counter summary whose partial states combine
  * associatively, so Spark runs it partial/final like any hash
  * aggregate. Guarantee: any item with true frequency > n/(k+1)
  * survives, and every reported count is an underestimate by at most
  * the sketch's global undercount. At 100 TB this replaces an exact
  * (unbounded-state) top-k when the key space doesn't fit — the exact
  * q49 term-frequency query is the scored ground truth of this family.
  *
  * Merge follows Agarwal et al. ("Mergeable Summaries"): sum counters,
  * then subtract the (k+1)-th largest count from every counter and
  * drop non-positives — the merged sketch keeps the same error bound.
  */
object FrequentItems {

  type Sketch = Map[String, Long]

  final class MisraGries(k: Int)
      extends Aggregator[String, Sketch, Sketch] {

    override def zero: Sketch = Map.empty

    override def reduce(b: Sketch, item: String): Sketch =
      if (b.contains(item)) b.updated(item, b(item) + 1L)
      else if (b.size < k) b.updated(item, 1L)
      else {
        // decrement-all step, dropping zeroed counters
        b.flatMap { case (i, c) =>
          if (c > 1L) Some(i -> (c - 1L)) else None
        }
      }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      val summed = b.foldLeft(a) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (i, c) =>
          if (c - cut > 0L) Some(i -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Sketch): Sketch = b

    override def bufferEncoder: Encoder[Sketch] =
      implicitly[Encoder[Sketch]](Encoders.kryo[Sketch])
    override def outputEncoder: Encoder[Sketch] =
      implicitly[Encoder[Sketch]](Encoders.kryo[Sketch])
  }
}
