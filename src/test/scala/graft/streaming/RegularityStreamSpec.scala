package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.{QueriesMart, SparkSpec, Tables}

class RegularityStreamSpec extends SparkSpec {
  import spark.implicits._

  test("full replay reproduces the batch bot screen bit-for-bit") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", date_trunc("second", $"ts").as("ts"))
      .as[RegularityStream.UserEvent]
    // one batch, empty state: the same code path streaming runs per
    // micro-batch; apply the batch query's gate/sort/head in the spec
    // gate on sum_gap_s > 0: the exact condition the batch twin uses
    // (__sg > 0). Gating on the derived truncated mean would diverge
    // on a user whose floor(1000*sg/gaps) is 0 despite sg > 0.
    val streamed = RegularityStream.regularity(ev)
      .where($"n_events" >= 50 && $"sum_gap_s" > 0)
      .select($"user_id", $"n_events", $"mean_gap_s_permille", $"burstiness_permille")
      .orderBy($"burstiness_permille".asc, $"user_id".asc)
      .limit(20)
    val batch = QueriesMart.botRegularity(spark, sf)
      .select($"user_id", $"n_events", $"mean_gap_s_permille", $"burstiness_permille")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "single-batch replay must equal the verified batch twin")
  }

  test("moments accumulate across micro-batches; metronome stays at zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, user: Long, epochS: Long) =
      RegularityStream.UserEvent(user, id, new Timestamp(epochS * 1000L))

    val in = MemoryStream[RegularityStream.UserEvent]
    val q = RegularityStream.regularity(in.toDS())
      .writeStream.format("memory").queryName("reg_x").outputMode("append").start()
    try {
      // batch 1: user 1 at 0,10,20 (metronome); user 2 at 0,1
      in.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 20), ev(4, 2, 0), ev(5, 2, 1))
      q.processAllAvailable()
      // batch 2: user 1 continues the metronome at 30 (gap vs STATE);
      // user 2 jumps to 100 (bursty: gaps 1, 99)
      in.addData(ev(6, 1, 30), ev(7, 2, 100))
      q.processAllAvailable()
      val rows = spark.table("reg_x")
        .select($"user_id", $"n_events", $"n_gaps", $"burstiness_permille")
        .as[(Long, Long, Long, Long)].collect().toList
      // last emission per user carries the cumulative moments
      val finalByUser = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(finalByUser(1L) == ((1L, 4L, 3L, 0L)),
        "constant 10 s gaps across batches must stay a perfect metronome")
      // user 2: gaps 1,99 -> n=2, sg=100, sgg=9802 -> (2*9802-10000)*1000/10000 = 960
      assert(finalByUser(2L) == ((2L, 3L, 2L, 960L)), finalByUser(2L).toString)
    } finally q.stop()
  }

  test("a straggler is counted as an event but forms no gap and cannot regress state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, epochS: Long) =
      RegularityStream.UserEvent(7L, id, new Timestamp(epochS * 1000L))

    val in = MemoryStream[RegularityStream.UserEvent]
    val q = RegularityStream.regularity(in.toDS())
      .writeStream.format("memory").queryName("reg_y").outputMode("append").start()
    try {
      in.addData(ev(1, 100), ev(2, 200))
      q.processAllAvailable()
      in.addData(ev(3, 150)) // straggler: predates the stored last event
      q.processAllAvailable()
      in.addData(ev(4, 300)) // gap must be 100 (vs ts=200), not 150
      q.processAllAvailable()
      val last = spark.table("reg_y")
        .select($"n_events", $"n_gaps", $"mean_gap_s_permille")
        .as[(Long, Long, Long)].collect().maxBy(_._1)
      // events 4, real gaps 2 (100 + 100), mean 100000 permille
      assert(last == ((4L, 2L, 100000L)), last.toString)
    } finally q.stop()
  }
}
