package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Salting

class SaltingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join result equals plain join under Zipf skew") {
    // hub key 0 carries 50% of rows
    val big = (0 until 20000).map { i =>
      (if (i % 2 == 0) 0L else (i % 37).toLong, s"v$i")
    }.toDF("k", "payload")
    val small = (0 until 37).map(k => (k.toLong, s"dim$k")).toDF("k", "dim")

    val plain = big.join(small, Seq("k")).select("k", "payload", "dim")
      .collect().map(_.toSeq).toSet
    val hot = Salting.heavyKeys(big, "k", 1000)
    assert(hot == Seq("0"))
    val salted = Salting.saltedJoin(big, small, "k", hot, 8)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salted left join preserves unmatched rows") {
    val big = (0 until 1000).map(i => ((i % 5).toLong, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b")).toDF("k", "dim")
    val plain = big.join(small, Seq("k"), "left").collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(big, small, "k", Seq("0"), 4, "left")
      .select("k", "v", "dim").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("autoSaltedJoin falls back to plain join with no hot keys") {
    val big = (0 until 100).map(i => (i.toLong, i)).toDF("k", "v")
    val small = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "dim")
    assert(Salting.autoSaltedJoin(big, small, "k", threshold = 10).count() == 100)
  }

  test("j10_salted_skew genuinely takes the salted arm on the fixture") {
    // guards the driver gate's meaning: if the hot-key list were empty,
    // autoSaltedJoin would silently fall back to a plain join and the
    // oracle row would prove nothing about the salting machinery
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val hot = Salting.heavyKeys(d, "lang", math.max(1L, d.count() / 4))
    assert(hot.nonEmpty, "hot-key list empty — gate would test a plain join")
    val q = graft.SparkEntry.queries("j10_salted_skew")(spark, dir)
    // structurally salted: the join key set includes the salt column
    assert(q.queryExecution.executedPlan.toString.contains("_salt"))
    // and the salted result IS the plain join's
    val dim = d.groupBy(col("lang")).agg(count(lit(1)).as("lang_total"))
    val plain = d.join(dim, Seq("lang"))
      .select("doc_id", "lang", "lang_total").collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet == plain)
  }

  test("sampled hot-key detection finds the hub without a full scan") {
    // hub key 0 carries 50% of 200k rows; a 1% sample must find it and
    // only it, and the salted join over the sampled hot list must equal
    // the plain join
    val big = (0 until 200000).map { i =>
      (if (i % 2 == 0) 0L else (i % 97).toLong, i)
    }.toDF("k", "v")
    val small = (0 until 97).map(k => (k.toLong, s"d$k")).toDF("k", "dim")
    val hot = Salting.heavyKeysSampled(big, "k", threshold = 20000,
      fraction = 0.01)
    assert(hot == Seq("0"), hot.toString)
    val plain = big.join(small, Seq("k")).count()
    val salted = Salting.saltedJoin(big, small, "k", hot, 8).count()
    assert(salted == plain)
    // fraction >= 1 degrades to the exact detector
    assert(Salting.heavyKeysSampled(big, "k", 20000, fraction = 1.0) == Seq("0"))
  }
}
