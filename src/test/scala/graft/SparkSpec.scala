package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSession {
  lazy val spark: SparkSession = Graft.session("local[4]", shufflePartitions = 4)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  /** Evaluate a single-value SQL expression. */
  def sql1(expr: String): Any = spark.sql(s"SELECT $expr").collect()(0).get(0)

  def assertSql(expr: String, expected: Any): Unit = {
    val got = sql1(expr)
    (got, expected) match {
      case (g: Double, e: Double) => assert(math.abs(g - e) < 1e-9, s"$expr -> $g != $e")
      case _ => assert(got == expected, s"$expr -> $got != $expected")
    }
  }

  def assertSqlApprox(expr: String, expected: Double, tol: Double): Unit = {
    val got = sql1(expr).asInstanceOf[Double]
    assert(math.abs(got - expected) <= tol, s"$expr -> $got !~ $expected (tol $tol)")
  }
}
