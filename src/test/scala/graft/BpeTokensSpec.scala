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
    // longest-first ordering: no unit is preceded by a shorter one
    val units = BpeTokens.pattern.split('|').dropRight(1)
    assert(units.sliding(2).forall {
      case Array(a, b) => a.length >= b.length
      case _ => true
    })
  }
}
