package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry}

/** Skew rehearsal harness (VERDICT r13 item 7): runs the join / dedup
  * / selection families on the PLAIN sf1 twin and on the
  * skew-adversarial twin ([[MakeSkew]]), recording per query the wall
  * time AND the task-time distribution (max task vs mean task — the
  * straggler signal wall time alone hides: an AQE skew split keeps
  * the max near the mean; an unhandled hot key shows one task
  * carrying the whole group). Prints the BENCH_NOTES markdown table.
  *
  * Usage: `runMain graft.tools.SkewProbe [plainDir] [skewDir]`
  * (generates both twins on demand). */
object SkewProbe {

  private val queries = Seq(
    // joins / rollups that hit the hot customer and hot part
    "q_skew_salted", "q_top_customers", "q_customer_metrics",
    "q_gold_enriched", "q_top_products", "q_key_skew",
    // paragraph family over the viral block + dedup over the dense cluster
    "q_paragraph_dedup", "q_paragraph_strip", "q_dedup_exact",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_resolve",
    // selection / packing over the dominant source
    "q_token_budget", "q_mix_materialize", "q_seq_pack", "q_corpus_funnel")

  final case class Stat(wallS: Double, nTasks: Long, maxTaskMs: Long, meanTaskMs: Long)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val plain = args.lift(0).getOrElse(MakeSf1.ensure(spark))
    val skew = args.lift(1).getOrElse(MakeSkew.ensure(spark))

    val maxTask = new AtomicLong(0)
    val sumTask = new AtomicLong(0)
    val nTask = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        maxTask.updateAndGet(m => math.max(m, d))
        sumTask.addAndGet(d)
        nTask.incrementAndGet()
        ()
      }
    })

    def run(name: String, dir: String): Stat = {
      org.apache.spark.GraftBusFlush.flush(spark.sparkContext)
      maxTask.set(0); sumTask.set(0); nTask.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write
        .mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftBusFlush.flush(spark.sparkContext)
      val n = math.max(nTask.get(), 1L)
      Stat(wall, n, maxTask.get(), sumTask.get() / n)
    }

    println("| query | plain wall s | skew wall s | wall ratio | plain max/mean task | skew max/mean task | skew max task ms |")
    println("|---|---|---|---|---|---|---|")
    queries.foreach { q =>
      // untimed warmup on BOTH dirs: page cache + JIT must not bill
      // the plain side (it runs first) — the measured pair below then
      // compares equally-warm scans
      run(q, plain); run(q, skew)
      val p = run(q, plain)
      val s = run(q, skew)
      def ratio(st: Stat): String =
        f"${st.maxTaskMs.toDouble / math.max(st.meanTaskMs, 1L)}%.1fx"
      println(f"| $q | ${p.wallS}%.2f | ${s.wallS}%.2f | ${s.wallS / p.wallS}%.2fx " +
        f"| ${ratio(p)} | ${ratio(s)} | ${s.maxTaskMs} |")
    }
    spark.stop()
  }
}
