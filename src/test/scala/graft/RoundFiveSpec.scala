package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-5 depth items: tokenizer parametricity, pipe arg quoting, and
  * multimodal hygiene pinned at the unit level. */
class RoundFiveSpec extends SparkTestBase {
  import spark.implicits._

  test("unicode tokenizer recovers letter/digit runs incl. non-ASCII scripts") {
    val df = Seq(
      "Customer#000000001 (nation#7); ok",
      "héllo wörld-42 ñandú",
      "").toDF("t")
    val got = df.select(TextAnalysis.tokens($"t", "unicode").as("tk"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("Customer", "000000001", "nation", "7", "ok"))
    assert(got(1) == Seq("héllo", "wörld", "42", "ñandú"))
    assert(got(2) == Seq.empty)
    // whitespace mode keeps punctuation glued — the modes really differ
    val ws = df.select(TextAnalysis.tokens($"t", "whitespace").as("tk"))
      .as[Seq[String]].collect()
    assert(ws(0) == Seq("Customer#000000001", "(nation#7);", "ok"))
  }

  test("unknown tokenizer mode is rejected eagerly") {
    intercept[IllegalArgumentException] {
      TextAnalysis.tokens($"t", "bpe")
    }
  }
}
