package graft

import graft.ops.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the asof / range join cores against a naive
  * in-memory oracle: inclusive ties, interval endpoints, and bucket
  * edges are exactly where the window/bucket formulations can drift
  * from the intended semantics, and the sf0.01 testdata is too smooth
  * to be guaranteed to hit them.
  */
class JoinBoundarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val H = 100L // small interval so bucket edges are easy to hit

  // (event_id, user_id, us, event_type, value)
  private val events: Seq[(Long, Long, Long, String, Double)] = Seq(
    // user 1: tie + endpoint probes around the purchase at t=1000
    (1L, 1L, 1000L, "purchase", 5.0),
    (10L, 1L, 999L, "click", 0.0),       // BEFORE any purchase: no asof match, outside range
    (11L, 1L, 1000L, "click", 0.0),      // tie: asof matches (inclusive), range excludes (strict >)
    (12L, 1L, 1001L, "click", 0.0),      // range includes
    (13L, 1L, 1000L + H, "click", 0.0),  // endpoint: range includes (<=)
    (14L, 1L, 1001L + H, "click", 0.0),  // past endpoint: range excludes
    // user 2: two purchases; later one wins ties
    (2L, 2L, 500L, "purchase", 1.0),
    (3L, 2L, 800L, "purchase", 2.0),
    (20L, 2L, 799L, "click", 0.0),       // asof -> purchase@500
    (21L, 2L, 800L, "click", 0.0),       // asof -> purchase@800 (tie, inclusive)
    // user 3: purchase one tick before a bucket edge; click exactly on it
    (4L, 3L, 3L * H - 1L, "purchase", 3.0),
    (30L, 3L, 3L * H, "click", 0.0),     // crosses the bucket boundary, in range
    // user 4: clicks but no purchases
    (40L, 4L, 100L, "click", 0.0))

  private def df = events.toDF("event_id", "user_id", "us", "event_type", "value")

  test("asof join matches the naive latest-at-or-before oracle") {
    val got = Relational.asofClickPurchase(df)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    val naive = events.filter(_._4 == "click").flatMap { c =>
      val cands = events.filter(p =>
        p._4 == "purchase" && p._2 == c._2 && p._3 <= c._3)
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(_._3)
        Some((c._1, best._3, best._5))
      }
    }.sortBy(_._1)
    assert(got == naive)
    // the specific boundary claims, spelled out
    val byId = got.map(r => r._1 -> r).toMap
    assert(!byId.contains(10L), "click before any purchase must drop")
    assert(byId(11L)._2 == 1000L, "equal-ts purchase must match (inclusive)")
    assert(byId(20L)._2 == 500L)
    assert(byId(21L)._2 == 800L, "tie picks the purchase AT the click ts")
  }

  test("range join counts match the naive interval oracle at edges") {
    val got = Relational.rangeJoinCounts(df, H)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = events.filter(_._4 == "purchase").map { p =>
      p._1 -> events.count(c => c._4 == "click" && c._2 == p._2 &&
        c._3 > p._3 && c._3 <= p._3 + H).toLong
    }.toMap
    assert(got == naive)
    assert(got(1L) == 2L, "strict > at the start, inclusive <= at the end")
    assert(got(4L) == 1L, "a match across the bucket edge must be found")
    assert(got(2L) == 0L && got(3L) == 0L)
  }
}
