package graft.text

/** Subword (BPE-style) token counting over a COMMITTED merges table.
  *
  * The merge inventory below is a fixed, public-knowledge list of the
  * highest-frequency English character pairs/triples (the units the
  * byte-pair-encoding algorithm of Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units", learns first
  * on any large English corpus — th/he/in/er/…, then ing/ion/ent/…).
  * Committing the table makes the tokenizer fully deterministic: no
  * training step, no environment dependence, same count on every
  * engine.
  *
  * Tokenization is GREEDY LONGEST-MATCH over the unit inventory —
  * at each position consume the longest vocabulary unit that matches,
  * else one non-space character — which both Spark and DuckDB can run
  * IDENTICALLY as a single `regexp_extract_all` with the alternation
  * ordered longest-first (regex alternation is first-match-wins in
  * Java regex and RE2 alike, so longest-first ordering IS the greedy
  * longest-match): the whole tokenizer stays inside whole-stage
  * codegen as one built-in string function — no UDF, no shuffle, and
  * the DuckDB oracle runs the very same pattern.
  *
  * Units never contain spaces, so matches cannot cross word
  * boundaries (the BPE word-boundary convention); characters outside
  * the inventory count as one token each (the `[^ ]` fallback), the
  * unknown-token convention.
  */
object BpeTokens {

  /** Merge results in rank order (earliest-learned first). 2- and
    * 3-char units from the published English pair-frequency tables;
    * extending the list only refines counts, never breaks determinism. */
  val merges: Seq[String] = Seq(
    // rank-ordered bigram merges
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur",
    // second-round merges (pair + single → trigram units)
    "the", "ing", "and", "ion", "ent", "ati", "for", "her", "ter",
    "hat", "tha", "ere", "con", "res", "ver", "all", "ons", "nce",
    "men", "ith", "ted", "ers", "pro", "thi", "wit", "are", "ess",
    "not", "ive", "was", "ect", "rea", "com", "eve", "per", "int",
    "est", "sta", "cti", "ica", "ist", "ear", "ain", "one", "our",
    "iti", "rat")

  /** The flat greedy longest-match pattern: units longest-first (ties
    * in merge-rank order), then the single-character fallback. Units
    * are all lowercase alphanumeric — nothing needs regex escaping.
    * Kept as the REFERENCE form; the registered query runs the
    * trie-factored [[pattern]], spec-pinned token-identical to this. */
  val flatPattern: String = {
    val ordered = merges.zipWithIndex
      .sortBy { case (u, rank) => (-u.length, rank) }
      .map(_._1)
    (ordered :+ "[^ ]").mkString("|")
  }

  /** Trie-factored equivalent of [[flatPattern]]: units grouped by
    * first character (`t(?:he|hi|ha|h|i|o|e)`-style), tails
    * longest-first within each group, groups in character order.
    *
    * Equivalence: every unit alternative starts with a distinct
    * literal first character, so at any input position AT MOST ONE
    * group can match — group order is irrelevant — and within that
    * group the longest-first tail ordering reproduces the flat
    * pattern's longest-unit-wins choice exactly (equal-length ties
    * keep merge-rank order). What changes is COST: the engine fails
    * each non-matching group on its first literal character (~1
    * comparison) instead of attempting a full multi-character unit
    * match per alternation branch, so the per-character constant drops
    * from ~98 branch attempts to ~20 first-char dispatches. Both Java
    * regex and DuckDB's RE2 support the non-capturing `(?:)` groups,
    * so Spark and the oracle still run the identical pattern string. */
  val pattern: String = {
    val groups = merges.groupBy(_.head).toSeq.sortBy(_._1).map {
      case (c0, us) =>
        val tails = us.zipWithIndex
          .sortBy { case (u, rank) => (-u.length, rank) }
          .map(_._1.tail)
        s"$c0(?:${tails.mkString("|")})"
    }
    (groups :+ "[^ ]").mkString("|")
  }
}
