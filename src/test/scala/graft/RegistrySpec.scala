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

  test("graft_dot / graft_sq_dist SQL equals the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.5, -2.0, 3.25), Array(0.5, 4.0, -1.0))).toDF("a", "b")
    df.createOrReplaceTempView("vec_pairs")
    val viaSql = spark
      .sql("SELECT graft_dot(a, b) AS d, graft_sq_dist(a, b) AS s FROM vec_pairs")
      .collect()(0)
    val viaCol = df
      .select(
        graft.functions.exprs.dot_d(col("a"), col("b")).as("d"),
        graft.functions.exprs.sq_dist(col("a"), col("b")).as("s")
      )
      .collect()(0)
    assert(viaSql.getDouble(0) == viaCol.getDouble(0))
    assert(viaSql.getDouble(1) == viaCol.getDouble(1))
  }

  test("graft_rfft_mag2 SQL equals the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Tuple1(Array(1.0, 2.0, -1.0, 0.5, 3.0, -2.5, 0.0, 1.25))).toDF("xs")
    df.createOrReplaceTempView("seg")
    val viaSql =
      spark.sql("SELECT graft_rfft_mag2(xs) AS m FROM seg").collect()(0).getSeq[Double](0)
    val viaCol = df
      .select(graft.functions.exprs.rfft_mag2(col("xs")).as("m"))
      .collect()(0)
      .getSeq[Double](0)
    assert(viaSql.length == 5) // n/2 + 1 bins
    assert(viaSql == viaCol)
  }

  test("graft_simhash64 SQL equals the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("alpha beta gamma delta epsilon").toDF("t")
    df.createOrReplaceTempView("sim_docs")
    val viaSql = spark
      .sql("SELECT graft_simhash64(split(t, ' '), 1024) AS s FROM sim_docs")
      .collect()(0)
      .getSeq[Long](0)
    val viaCol = df
      .select(graft.functions.exprs.simhash64(split(col("t"), " "), 1024).as("s"))
      .collect()(0)
      .getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("graft_minhash_sig SQL equals the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (a, b) = (Array(3L, 5L, 7L), Array(11L, 13L, 17L))
    val df = Seq("one two three four five six").toDF("t")
    df.createOrReplaceTempView("mh_docs")
    val viaSql = spark
      .sql(
        "SELECT graft_minhash_sig(split(t, ' '), 3, 1024, " +
          "array(3L, 5L, 7L), array(11L, 13L, 17L)) AS ms FROM mh_docs"
      )
      .collect()(0)
      .getSeq[Long](0)
    val viaCol = df
      .select(graft.functions.exprs.minhash_sig(split(col("t"), " "), 3, 1024, a, b).as("ms"))
      .collect()(0)
      .getSeq[Long](0)
    assert(viaSql.length == 3)
    assert(viaSql == viaCol)
  }

  test("non-literal scalar parameters are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(split('a b c', ' '), 1 + 2, 1024)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("graft_shingle_hashes"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_simhash64(split('a b c', ' '), 1 + 2)").collect()
    }
    assert(e2.getMessage.contains("integer literal") || e2.getMessage.contains("graft_simhash64"))
    val e3 = intercept[Exception] {
      // a non-literal permutation array (column reference) must be rejected
      spark.sql(
        "SELECT graft_minhash_sig(split('a b c', ' '), 3, 1024, array(t_len), array(1L)) " +
          "FROM (SELECT 5L AS t_len)"
      ).collect()
    }
    assert(e3.getMessage.contains("array literal") || e3.getMessage.contains("graft_minhash_sig"))
  }
}
