package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: graft's custom expressions are
  * callable from plain SQL once registered (cluster path:
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  graft.functions.GraftFunctions.register(spark)

  test("graft_dot / graft_sq_dist evaluate from SQL") {
    val r = spark
      .sql("SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d, " +
        "graft_sq_dist(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS s")
      .collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 25.0)
  }

  test("graft_shingle_hashes and graft_simhash64 evaluate from SQL and match the Column API") {
    val viaSql = spark
      .sql("SELECT graft_shingle_hashes(split('a b c d', ' '), 3, 1024) AS sh, " +
        "graft_simhash64(split('a b c d', ' '), 1024) AS sim")
      .collect()(0)
    assert(viaSql.getSeq[Long](0).length == 2) // shingles "a b c", "b c d"
    assert(viaSql.getSeq[Long](1).length == 2) // [hi, lo]
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaCol = Seq("a b c d").toDF("t")
      .select(graft.functions.exprs.shingle_hash_set(split(col("t"), " "), 3, 1024).as("sh"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql.getSeq[Long](0) == viaCol)
  }

  test("non-literal scalar parameters are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(split('a b c', ' '), 1 + 2, 1024)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("graft_shingle_hashes"))
  }
}
