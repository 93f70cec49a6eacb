package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session; cheap). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf: String = "/root/testdata/sf0.001"

  /** Run `f` under a fixed [[Caching.share]] mode. Plan-shape specs
    * that assert on operators or storage levels BELOW a shared
    * intermediate pin the structure under `persist` (lazy columnar
    * cache keeps the subtree visible in the executed plan); the
    * default `checkpoint` mode replaces the subtree with an
    * ExistingRDD scan — same rows, same shape executed, invisible to
    * a plan-string assert. */
  def withShareMode[A](mode: String)(f: => A): A = {
    val key = "spark.graft.share.mode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(4)
}
