package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Frac, MarkovAttribution}

class MarkovAttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ev(user: Long, id: Long, min: Int, tpe: String) =
    (user, id, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), tpe)

  test("hand-solved two-channel chain: converting channel gets all the credit") {
    // user A: view -> purchase; user B: click -> (no conversion)
    val events = Seq(
      ev(1, 1, 1, "view"), ev(1, 2, 2, "purchase"),
      ev(2, 3, 1, "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = MarkovAttribution.removalEffects(events,
      "user_id", "event_type", "ts", "event_id", "purchase")
      .orderBy("channel").collect()
    val byChan = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // p(conv) = 1/2; removing view kills it entirely, removing click
    // changes nothing
    assert(byChan("view") == ((10000L, 10000L, 5000L)))
    assert(byChan("click") == ((0L, 0L, 5000L)))
  }

  test("transitions truncate at the FIRST conversion") {
    val events = Seq(
      ev(1, 1, 1, "view"), ev(1, 2, 2, "purchase"),
      ev(1, 3, 3, "click"), ev(1, 4, 4, "purchase")) // post-conv tail ignored
      .toDF("user_id", "event_id", "ts", "event_type")
    val tr = MarkovAttribution.transitions(events,
      "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, String, Long)].collect().toSet
    assert(tr == Set(("start", "view", 1L), ("view", "conv", 1L)))
  }

  test("exact rational solve agrees with double power iteration on random journeys") {
    val rnd = new scala.util.Random(13)
    val chans = Vector("view", "click", "error", "signup")
    val rows = (1 to 200).flatMap { u =>
      val len = 1 + rnd.nextInt(6)
      val steps = Vector.fill(len)(chans(rnd.nextInt(chans.size))) ++
        (if (rnd.nextBoolean()) Vector("purchase") else Vector.empty)
      steps.zipWithIndex.map { case (t, i) => ev(u, u * 100L + i, i + 1, t) }
    }
    val events = rows.toDF("user_id", "event_id", "ts", "event_type")
    val counts = MarkovAttribution.transitions(events,
        "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, String, Long)].collect().toSeq
    val exact = MarkovAttribution.absorption(counts)
    // reference: dense double power iteration to convergence
    val states = counts.map(_._1).distinct
    val tot = counts.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum.toDouble }
    var p = states.map(_ -> 0.0).toMap
    for (_ <- 1 to 2000)
      p = states.map { s =>
        s -> counts.filter(_._1 == s).map { case (_, t, n) =>
          val pt = if (t == "conv") 1.0 else if (t == "null") 0.0 else p(t)
          n / tot(s) * pt
        }.sum
      }.toMap
    states.foreach { s =>
      val e = exact(s); val ref = p(s)
      assert(math.abs(e.num.toDouble / e.den.toDouble - ref) < 1e-9, s)
    }
  }

  test("input order does not change the attribution (determinism)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 50).flatMap { u =>
      val len = 1 + rnd.nextInt(4)
      val steps = Vector.fill(len)(Vector("view", "click")(rnd.nextInt(2))) ++
        (if (u % 3 == 0) Vector("purchase") else Vector.empty)
      steps.zipWithIndex.map { case (t, i) => ev(u, u * 100L + i, i + 1, t) }
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      MarkovAttribution.removalEffects(df, "user_id", "event_type",
        "ts", "event_id", "purchase").orderBy("channel").collect().toSeq
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    assert(run(df) == run(df.orderBy(rand(7))))
  }

  test("Frac.floorScaled floors negatives correctly") {
    assert(Frac.mk(-1, 3).floorScaled(10000L) == -3334L)
    assert(Frac.mk(1, 3).floorScaled(10000L) == 3333L)
    assert(Frac.mk(-1, 2).floorScaled(2L) == -1L)
  }
}
