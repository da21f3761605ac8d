package graft.streaming

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import SessionStream.{GapUs, OpenSession}

/** Property tests for the sessionizer's state-merge core — the function
  * every correctness claim of `stream_session_state` rests on. The stream
  * delivers events to a group in micro-batch-sized chunks in arbitrary
  * interleavings (within the watermark), so `merge` must be insensitive to
  * arrival order AND to how arrivals are batched: merge(all) ==
  * merge(merge(chunk1) ++ merge(chunk2)) for every split. Hand-rolled
  * forAll: scalatestplus-scalacheck is not in the offline cache.
  */
class SessionMergeProps extends AnyFunSuite {

  private val genEvent: Gen[OpenSession] = for {
    t <- Gen.chooseNum(0L, 5L * GapUs)
    v <- Gen.chooseNum(0L, 500000L)
  } yield OpenSession(t, t, 1L, v)

  private val genEvents: Gen[List[OpenSession]] =
    Gen.listOfN(40, genEvent)

  private def check(name: String, prop: Prop): Unit = {
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      val res = prop(params.withInitialSeed(Seed(i.toLong)))
      assert(res.success, s"$name failed at seed $i: $res")
    }
  }

  private def canonical(ss: List[OpenSession]): List[OpenSession] =
    ss.sortBy(s => (s.startUs, s.endUs))

  test("merge is arrival-order invariant") {
    check("order-invariance", Prop.forAll(genEvents) { evs =>
      val a = SessionStream.merge(evs)
      val b = SessionStream.merge(scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(evs))
      canonical(a) == canonical(b)
    })
  }

  test("merge is batching-invariant (incremental == one-shot)") {
    check("batching-invariance", Prop.forAll(genEvents, Gen.chooseNum(0, 40)) {
      (evs, cut) =>
        val (c1, c2) = evs.splitAt(math.min(cut, evs.length))
        val incremental = SessionStream.merge(
          SessionStream.merge(c1) ++ SessionStream.merge(c2))
        canonical(incremental) == canonical(SessionStream.merge(evs))
    })
  }

  test("merged sessions conserve events and value, and respect the gap") {
    check("conservation", Prop.forAll(genEvents) { evs =>
      val m = SessionStream.merge(evs)
      val conserved = m.map(_.n).sum == evs.size &&
        m.map(_.valueQ).sum == evs.map(_.valueQ).sum
      val sorted = canonical(m)
      val separated = sorted.zip(sorted.drop(1))
        .forall { case (a, b) => b.startUs - a.endUs > GapUs }
      val wellFormed = m.forall(s => s.startUs <= s.endUs)
      conserved && separated && wellFormed
    })
  }
}
