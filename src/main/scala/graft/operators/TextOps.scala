package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / dedup column operators for the LLM-data-pipeline surface.
  *
  * Everything here is built from Catalyst higher-order functions (transform/
  * aggregate/filter) and md5 — no UDFs, no codegen barriers, and every
  * operator is a pure per-row projection: at 100 TB these run map-side at
  * scan speed; only the downstream groupBy/join (dedup bucketing, candidate
  * pairing) shuffles, and it shuffles *short digests*, never the documents.
  *
  * Determinism: "random" hash functions are md5 with an integer seed prefix,
  * and min-hash minimizes the hex *string* — portable bit-for-bit to any
  * engine with md5 (the DuckDB oracle replicates each formulation exactly).
  * Generalizes the reference's single-document extraction pipeline
  * (/root/reference/download_lambda.py:88-119) to corpus-level analysis.
  */
object TextOps {

  /** Whitespace tokenizer (fixture docs are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** k-word shingles as strings; expects size(toks) >= k. */
  def wordShingles(toks: Column, k: Int): Column =
    transform(sequence(lit(1), size(toks) - (k - 1)), i =>
      concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*))

  /** MinHash signature: numHashes seeded-md5 min-hex-strings over shingles.
    * Min over lexicographic hex is as uniform as min over the number the
    * hex encodes, and needs no 64-bit integer parsing. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      array_min(transform(shingles, sh =>
        md5(concat(j.cast("string"), lit(":"), sh)))))

  /** LSH band keys: md5 over each band of `rowsPerBand` signature entries.
    * Returns array<struct<band:int, bkey:string>> ready to explode; docs
    * sharing any (band, bkey) are near-dup candidates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.as("band"),
        md5(concat_ws("", transform(sequence(lit(1), lit(rowsPerBand)), r =>
          element_at(sig, b * rowsPerBand + r)))).as("bkey")))

  /** 16-bit SimHash over md5(token) nibbles, as a '0'/'1' string. Each bit
    * is the sign of sum(+1/-1) over tokens — exact integer arithmetic. */
  def simhash16(text: Column): Column = {
    val bit = expr(
      """transform(sequence(1, 16), i ->
        |  CASE WHEN aggregate(transform(split(text, ' '), t -> md5(t)), 0,
        |    (acc, h) -> acc + (CASE WHEN substring(h, i, 1)
        |       IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0
        |  THEN '1' ELSE '0' END)""".stripMargin)
    concat_ws("", bit)
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set (catches shuffled/duplicated-word near-copies). */
  def sortedTokenFingerprint(toks: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(toks))))

  /** Count of tokens that appear in a fixed marker list. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))
}
