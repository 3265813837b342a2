package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Keyed fan-out for CPU-bound kernel stages.
  *
  * A bare `repartition(col)` plans as REPARTITION_BY_COL, which AQE's
  * byte-based shuffle coalescing is free to collapse — and DOES: the
  * documents/embeddings tables are byte-small at bench scale (~15 MB
  * of text at sf0.1, far under the advisory partition size), so every
  * kernel tier's "spread before the kernel" shuffle coalesced to ONE
  * task and the whole tier ran single-threaded (measured r20 with a
  * stage listener: the entire k2 minhash tier — ~20M md5 digests +
  * 77k-pair verify — was a chain of tasks=1 stages; 13.9 s where the
  * DuckDB oracle needs 0.2 s). Bytes are the wrong currency for
  * compute-heavy narrow rows. An EXPLICIT partition count plans as
  * REPARTITION_BY_NUM, which AQE's coalescer exempts (user-pinned),
  * so the fan-out survives. The count comes from the session's
  * configured shuffle parallelism — the same knob a cluster operator
  * already sizes to the executor fleet — not a hardcoded constant.
  * (SimQueries' cosine-cell fan-out has used this form since r18 for
  * the same reason; r20 extends it to every kernel fan-out.)
  */
object Fanout {
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, key)
}
