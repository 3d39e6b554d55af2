package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, KvSink, Salting, TextOps}

/** Marker-collision contract: every operator that stages internal temp
  * columns onto CALLER input must reject an input whose own columns use one
  * of those names (withColumn would silently replace the caller's column —
  * corrupting the operator's state or losing caller data). One failing case
  * per guarded operator; the happy paths are covered by each operator's own
  * spec, so these only pin the loud-rejection side. */
class MarkersSpec extends SparkTestBase {

  import spark.implicits._

  test("Salting.topKByKey rejects a caller column named _salt") {
    val df = Seq((1L, 2L)).toDF("k", "_salt")
    val e = intercept[IllegalArgumentException] {
      Salting.topKByKey(df, col("k"), Seq(col("_salt")), 1,
        nSalts = 4, saltOn = col("k"))
    }
    assert(e.getMessage.contains("_salt"))
  }

  test("EventOps.scd2 rejects a caller column named _prev") {
    val df = Seq((1L, 1L, 10L, 100L)).toDF("user_id", "_prev", "ts_us", "id")
    val e = intercept[IllegalArgumentException] {
      EventOps.scd2(df, "user_id", "_prev", "ts_us", "id")
    }
    assert(e.getMessage.contains("_prev"))
  }

  test("TextOps.redact rejects caller columns colliding with _cur and n_<rule>") {
    val rules = Seq(("email", "x+", "<X>"))
    val e1 = intercept[IllegalArgumentException] {
      TextOps.redact(Seq((1L, "t", "c")).toDF("doc_id", "text", "_cur"), rules)
    }
    assert(e1.getMessage.contains("_cur"))
    val e2 = intercept[IllegalArgumentException] {
      TextOps.redact(Seq((1L, "t", 0L)).toDF("doc_id", "text", "n_email"), rules)
    }
    assert(e2.getMessage.contains("n_email"))
  }

  test("KvSink.diff rejects a key column named _in_prev (shared guard)") {
    val a = Seq(("k", "v")).toDF("_in_prev", "value")
    val e = intercept[IllegalArgumentException] { KvSink.diff(a, a) }
    assert(e.getMessage.contains("_in_prev"))
  }
}
