package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH band machinery: candidate pairs from a banded relation —
  * one narrow (band-value, id) self-join per band column, unioned +
  * distinct. This is the common core of the MinHash (q23/q37), phash
  * (q35), and SRP (q55) candidate generators; the simhash variant
  * (q48) stays custom because it carries the signature payload through
  * the join instead of re-joining for it.
  *
  * NULL band values never equi-join, so callers encode "no signal"
  * (empty shingle sets, missing hashes) as NULL to keep degenerate
  * rows out of the candidate set — the all-pairs short-doc trap.
  *
  * Scale: each join ships only (band value, id); candidates stay
  * linear in N for band spaces sized to the corpus (see the sizing
  * notes at each call site).
  */
object LshBands {

  def candidatePairs(banded: DataFrame, idCol: String,
      bandCols: Seq[String]): DataFrame = {
    require(bandCols.nonEmpty, "at least one band column")
    def pairsOn(b: String): DataFrame = {
      // Band keys are NULLABLE BY DESIGN (zero-shingle docs get NULL
      // bands — see Dedup.signaturesOf) and null keys never equi-join,
      // so filter them out EXPLICITLY before the exchange: with
      // InferFiltersFromConstraints excluded engine-wide
      // (core.Sessions.local) nothing else prunes them, and a crawl's
      // short docs would otherwise ship one null-keyed row per band
      // join through a 100 TB shuffle to match nothing. Result-neutral
      // by inner-join semantics; audited by JoinKeyNullabilitySpec.
      val a = banded.select(col(idCol).as("d1"), col(b).as("__bv"))
        .filter(col("__bv").isNotNull)
      val c = banded.select(col(idCol).as("d2"), col(b).as("__bv"))
        .filter(col("__bv").isNotNull)
      a.join(c, "__bv").filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"))
    }
    bandCols.map(pairsOn).reduce(_ union _).distinct()
  }
}
