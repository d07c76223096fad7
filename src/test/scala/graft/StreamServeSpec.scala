package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The streaming ANN serving twin: queries arrive as a stream, the
  * layout is a static published artifact. Batch-twin equality against
  * ivfTopk is the contract — the stream path must not change answers.
  */
class StreamServeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("streaming ANN serving equals the batch IVF answers across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val emb = core.Tables.embeddings(spark, sf)
    // deterministic first-16 centroids — the same gate config ivfTopk pins
    val vd = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = vd
      .filter(col("vec_id") < 16)
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getSeq[Double](1).toArray)
    val cells = graft.llm.Similarity.ivfAssign(emb, cents)
    val qRows = vd
      .filter(col("vec_id") < 10)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val input = MemoryStream[(Long, Seq[Double])]
    val queries = input.toDF().toDF("qid", "embedding")
    val q = graft.llm.Similarity
      .serveStream(queries, cells, cents)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("serve_out")
      .start()
    input.addData(qRows.take(5).toSeq: _*)
    q.processAllAvailable()
    input.addData(qRows.drop(5).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows
        .map(r =>
          (
            r.getAs[Long]("qid"),
            r.getAs[Long]("vid"),
            r.getAs[Double]("cos"),
            r.getAs[Number]("rank").intValue()
          )
        )
        .sortBy(t => (t._1, t._4))
        .toSeq
    val got = canon(spark.sql("SELECT * FROM serve_out").collect())
    val want = canon(graft.llm.Similarity.ivfTopk(emb).collect())
    assert(got.size == want.size && got == want, s"stream serving diverged:\n$got\nvs\n$want")
  }
}
