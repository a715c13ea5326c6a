package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.exec.ValidationRunner

/** Coverage for the remaining Text/Vectors/stats surfaces. */
class TextVectorsSpec extends SparkTestBase {

  test("bpeish tokenization splits punctuation boundaries") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("hello, world! it's 42.")).toDF("text")
    val out = df.select(Text.bpeishTokens(col("text"))).collect()(0).getSeq[String](0)
    assert(out === Seq("hello", ",", "world", "!", "it", "'", "s", "42", "."))
    assert(df.select(Text.bpeishTokenCount(col("text"))).collect()(0).getInt(0) === 9)
  }

  test("punctRatio / avgTokenLength / qualityScore") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and runs to a hill of grass " * 3),
      ("punct", "!!! ??? ;;; ,,, ..." * 10),
      ("short", "hi")).toDF("id", "text")
    val out = df.select(col("id"),
      Text.punctRatio(col("text")).as("pr"),
      Text.avgTokenLength(col("text")).as("al"),
      Text.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("good")._1 < 0.05)
    assert(out("punct")._1 > 0.5)
    assert(math.abs(out("good")._2 - 3.67) < 0.5)
    assert(out("good")._3 === 1.0)   // length ok + low punct + stopwords present
    assert(out("short")._3 < 0.5)    // fails the length band
  }

  test("charShingles: sliding windows and short-text edge") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("abcde"), ("ab")).toDF("text")
    val out = df.select(Text.charShingles(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("abc", "bcd", "cde"))
    assert(out(1) === Seq("ab"))
  }

  test("l2Distance, normalize, hamming64") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      Vectors.l2Distance(col("a"), col("b")).as("d"),
      Vectors.norm(Vectors.normalize(col("a"))).as("n1"),
      Vectors.hamming64(lit(0b1011L), lit(0b0010L)).as("h")).collect()(0)
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getInt(2) === 2)
  }

  test("columnStatsByGroup agrees with per-group columnStats") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grouped = ValidationRunner.columnStatsByGroup(docs, "lang", Seq("n_chars"),
      exactDistinct = true).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5), r.getLong(6)))
      .toMap
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { lang =>
      val single = ValidationRunner.columnStats(
        docs.where(col("lang") === lang), Seq("n_chars"), exactDistinct = true).collect()(0)
      val g = grouped(lang)
      assert(g._1 === single.getLong(1), s"cnt for $lang")
      assert(g._3 === single.getString(3), s"min for $lang")
      assert(g._4 === single.getString(4), s"max for $lang")
      assert(g._5 === single.getLong(5), s"distinct for $lang")
    }
  }

  test("shingleHashes deterministic and order-sensitive") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("a b c d e"), ("a b c d e"), ("e d c b a")).toDF("text")
    val out = df.select(graft.ops.Dedup.shingleHashes(col("text"), 3)).collect()
      .map(_.getSeq[Long](0))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
    assert(out(0).length === 3) // 5 tokens, k=3 → 3 windows
  }
}
