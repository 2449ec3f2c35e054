package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish lexer") {
    val df = Seq("hello world, it's 2024!").toDF("t")
    val (ws, bpe) = df.select(
      TextAnalysis.tokenCountWs(col("t")),
      TextAnalysis.tokenCountBpe(col("t"))).as[(Int, Int)].head()
    assert(ws === 4)
    // hello | world | , | it | ' | s | 2024 | !
    assert(bpe === 8)
  }

  test("language ID picks marker-dense language; CJK beats all") {
    val df = Seq(
      "the cat and the dog of the house",
      "el perro y la casa de los gatos que ladran",
      "der hund und die katze ist das haus",
      "le chat et les chiens des maisons une fois",
      "这是一个中文句子"
    ).toDF("t")
    val out = df.select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(out === Seq("en", "es", "de", "fr", "zh"))
  }

  test("fingerprint is invariant to case, punctuation, and extra spaces") {
    val df = Seq(
      ("Hello,   World!", "hello world"),
      ("foo bar", "foo baz")
    ).toDF("a", "b").select(
      (TextAnalysis.fingerprint(col("a")) === TextAnalysis.fingerprint(col("b"))).as("eq"))
    assert(df.as[Boolean].collect() === Seq(true, false))
  }

  test("quality score is bounded and favors clean prose") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and that is it for now",
      ";;;!!! ??? ,,, ... ((()))"
    ).toDF("t").select(TextAnalysis.qualityScore(col("t")).as("q"))
    val Array(clean, noise) = df.as[Double].collect()
    assert(clean > noise)
    assert(clean <= 1.0 && noise >= 0.0)
  }
}
