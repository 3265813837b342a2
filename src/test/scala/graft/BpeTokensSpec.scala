package graft

import graft.text.BpeTokens
import org.scalatest.funsuite.AnyFunSuite

/** Greedy longest-match semantics of the committed-merges subword
  * tokenizer: the longest-first alternation IS the greedy match. */
class BpeTokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def count(s: String): Int =
    spark.sql(s"SELECT size(regexp_extract_all('$s', " +
      s"'${BpeTokens.pattern}', 0)) AS c").collect()(0).getInt(0)

  test("longest unit wins at each position") {
    assert(count("the") == 1) // trigram unit, not th+e
    assert(count("thin") == 2) // thi + n(fallback), not th+in? no: thi wins at 0
    assert(count("ingestion") == 3) // ing + est + ion
  }

  test("unknown characters count one token each; spaces separate") {
    assert(count("xqz") == 3) // no units — three fallbacks
    assert(count("the cat") == 3) // the | c | at — space never consumed
  }

  test("pattern is deterministic and space-free") {
    assert(BpeTokens.pattern == BpeTokens.pattern)
    assert(!BpeTokens.merges.exists(_.contains(" ")))
    // flat reference form: longest-first ordering — no unit is
    // preceded by a shorter one
    val units = BpeTokens.flatPattern.split('|').dropRight(1)
    assert(units.sliding(2).forall {
      case Array(a, b) => a.length >= b.length
      case _ => true
    })
    // factored form: one group per distinct first character
    assert(BpeTokens.pattern.count(_ == '(') ==
      BpeTokens.merges.map(_.head).distinct.length)
  }

  test("factored pattern tokenizes IDENTICALLY to the flat reference " +
    "pattern on a fuzz corpus (arrays, not just counts)") {
    // every character of every merge unit (so every factored group's
    // first char is reachable) plus out-of-inventory ones, so matches,
    // partial matches, and fallbacks all occur
    val alphabet = (BpeTokens.merges.mkString + " xqz7.").distinct
    assert(BpeTokens.merges.map(_.head).distinct
      .forall(alphabet.contains(_)),
      "fuzz alphabet must cover every factored group head")
    val rnd = new scala.util.Random(42)
    val docs = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    } :+ "the thin ingestion" :+ "" :+ "   " :+ "aaa"
    import spark.implicits._
    val df = docs.toDF("t")
    df.createOrReplaceTempView("bpe_fuzz")
    val neq = spark.sql(
      s"""SELECT t FROM bpe_fuzz
         |WHERE regexp_extract_all(t, '${BpeTokens.pattern}', 0)
         |   != regexp_extract_all(t, '${BpeTokens.flatPattern}', 0)
         |""".stripMargin).collect()
    assert(neq.isEmpty,
      s"factored != flat on: ${neq.map(_.getString(0)).take(5).toSeq}")
  }
}
