package graft

import graft.streaming.{AbsSt, StreamingAbsence}
import org.scalatest.funsuite.AnyFunSuite

/** Differential pin for the pure candidate-buffer core behind
  * [[StreamingAbsence.AbsenceProcessor]]: 500 seeded-random replays
  * (random gap, event set, batch structure, watermark lag and sweep
  * cadence) must confirm EXACTLY the silences a brute-force oracle reads
  * off the full sorted event list — every adjacent pair further apart
  * than `gap`, plus the trailing silence once the final watermark passes
  * its deadline. Also pins the state-size invariant the 100 TB posture
  * rests on: consecutive buffered candidates are always > gap apart. */
class AbsenceCoreSpec extends AnyFunSuite {

  private def bruteForce(ts: Seq[Long], gap: Long): Set[Long] = {
    val s = ts.distinct.sorted
    if (s.isEmpty) Set.empty
    else {
      val resumed = s.zip(s.tail).collect { case (a, b) if b - a > gap => a }
      (resumed :+ s.last).toSet // final wm passes last+gap -> trailing fires
    }
  }

  test("500 random replays: confirmed silences == brute force; invariant holds") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 500) {
      val gap = 1L + rnd.nextInt(20)
      val n = rnd.nextInt(31)
      val ts = Seq.fill(n)(rnd.nextInt(200).toLong)
      val sorted = ts.distinct.sorted
      // random contiguous batch structure over the sorted timeline
      val batches = {
        var rest = sorted
        val b = Seq.newBuilder[Seq[Long]]
        while (rest.nonEmpty) {
          val k = 1 + rnd.nextInt(rest.size)
          b += rest.take(k); rest = rest.drop(k)
        }
        b.result()
      }
      val disorder = rnd.nextInt(6).toLong
      var st = StreamingAbsence.Core.empty
      var wmMs = Long.MinValue
      val confirmed = Seq.newBuilder[Long]
      batches.foreach { batch =>
        val evs = batch.sorted.foldLeft(st.evs)(
          StreamingAbsence.Core.insert(gap))
        // invariant: consecutive alive candidates are > gap apart
        evs.zip(evs.tail).foreach { case (a, b) =>
          assert(b - a > gap, s"trial $trial: invariant broken in $evs (gap $gap)")
        }
        // watermark from the PREVIOUS batch (Spark semantics), then an
        // optional mid-stream timer sweep at the advanced watermark
        val (got1, st1) = StreamingAbsence.Core.sweep(gap,
          AbsSt(evs, st.emittedUpTo, st.armed), wmMs)
        confirmed ++= got1
        st = st1
        wmMs = math.max(wmMs, (batch.max - disorder) * 1000L)
        if (rnd.nextBoolean()) { // timer fired between batches
          val (got2, st2) = StreamingAbsence.Core.sweep(gap, st, wmMs)
          confirmed ++= got2
          st = st2
        }
      }
      // sentinel flush: final watermark passes every deadline
      val horizon = (sorted.lastOption.getOrElse(0L) + gap + 1) * 1000L
      val (got3, st3) = StreamingAbsence.Core.sweep(gap, st, horizon)
      confirmed ++= got3
      val got = confirmed.result()
      assert(got == got.distinct && got == got.sorted,
        s"trial $trial: confirmations must be unique and ascending: $got")
      assert(got.toSet == bruteForce(ts, gap),
        s"trial $trial (gap $gap): got ${got.toSet} want ${bruteForce(ts, gap)} events $sorted")
      assert(st3.evs.isEmpty, s"trial $trial: buffer must drain at horizon")
    }
  }
}
