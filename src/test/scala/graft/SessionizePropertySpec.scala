package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.TimeSeries

/** Property: TimeSeries.sessionize equals a brute-force reference
  * (sort per key, split where gap > threshold) on random event sets.
  */
object SessionizePropertySpec extends Properties("Sessionize") {
  lazy val spark = GraftSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  val rowGen = for {
    key <- Gen.choose(0L, 2L)
    sec <- Gen.choose(0L, 400L)
  } yield (key, sec)

  property("matchesBruteForce") = Prop.forAll(Gen.listOfN(20, rowGen)) { rows =>
    import spark.implicits._
    val gap = 60L
    val data = rows.zipWithIndex.map { case ((k, sec), i) =>
      (i.toLong, k, new java.sql.Timestamp(1700000000000L + sec * 1000))
    }
    val got = TimeSeries.sessionize(
        data.toDF("event_id", "user_id", "ts"), "user_id", "ts", "event_id", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet

    val expected = data.groupBy(_._2).flatMap { case (k, evs) =>
      val secs = evs.map { case (id, _, t) => (t.getTime / 1000, id) }.sorted
      val sessions = secs.foldLeft(List.empty[List[Long]]) { case (acc, (sec, _)) =>
        acc match {
          case head :: tail if sec - head.last <= gap => (head :+ sec) :: tail
          case _ => List(sec) :: acc
        }
      }.reverse
      sessions.zipWithIndex.map { case (s, i) =>
        (k, (i + 1).toLong, s.size.toLong, s.last - s.head)
      }
    }.toSet
    got == expected
  }
}
