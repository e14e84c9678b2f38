package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {

  test("SparkSessionExtensions injects cosine_sim for plain SQL") {
    // getOrCreate reuses any live session and silently drops extensions —
    // this test is only meaningful when it builds the session itself
    assume(SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty,
      "another suite owns the JVM session")
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .appName("ext-test")
      .getOrCreate()
    try {
      // no GraftFunctions.register() call — the extension must provide it
      val r = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      val o = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head()
      assert(math.abs(o.getDouble(0)) < 1e-12)
    } finally spark.stop()
  }

  test("native expression matches the HOF composition numerically") {
    val spark = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new graft.corpus.CorpusGen.Rng(5)
    val df = (0 until 50).map(_ =>
      (Array.fill(16)(rng.nextDouble()), Array.fill(16)(rng.nextDouble())))
      .toDF("a", "b")
    val both = df.select(
      graft.functions.GraftFunctions.cosine_sim(col("a"), col("b")).as("native"),
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), _ + _) /
        (sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x)) *
         sqrt(aggregate(col("b"), lit(0.0), (acc, x) => acc + x * x)))).as("hof"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }
}
