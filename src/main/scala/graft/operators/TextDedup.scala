package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate text detection: MinHash+LSH, SimHash, and exact
  * n-gram-Jaccard verification.
  *
  * Everything is expressed with codegen'd higher-order functions over
  * arrays (`transform`, `aggregate`, `filter`) — no UDFs — and all
  * hashing is `xxhash64` with fixed seeds, so signatures are
  * deterministic across runs and cluster sizes.
  *
  * Scale shape (the standard LSH pipeline):
  *   1. per-doc signature (map-only, one pass over 100 TB);
  *   2. explode to (band, bucket) keys — output is #bands rows/doc, tiny
  *      compared to the text;
  *   3. self-join on bucket → candidate pairs (shuffle keyed on small
  *      band hashes, never on text);
  *   4. exact verification only on candidates (jaccardVerify), pulling
  *      text for the ~0.01% of pairs that collide.
  */
object TextDedup {

  /** Character shingles (distinct) of length n over the lowercased text. */
  def shingles(text: Column, n: Int): Column = {
    val t = lower(text)
    array_distinct(
      transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => t.substr(i, lit(n))))
  }

  /** MinHash signature: for permutation i, min over shingles s of
    * h_i(s) = xxhash64(seed=i, s). Returns array<long> of length nPerms.
    */
  def minHashSignature(shingleArr: Column, nPerms: Int): Column =
    transform(sequence(lit(0), lit(nPerms - 1)), i =>
      aggregate(shingleArr, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(i, s))))

  /** LSH banding: split the signature into bands of `rowsPerBand` and
    * hash each band → (doc, band_idx, bucket) rows.
    */
  def lshBuckets(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(b, slice(col(sigCol), b * lit(rowsPerBand) + lit(1),
            lit(rowsPerBand)).cast("string"))))
      .as(Seq("band", "bucket")))

  /** Candidate pairs = docs sharing ≥1 LSH bucket. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity between two token-set columns (arrays,
    * assumed distinct). Integer set sizes → the double division is
    * bit-exact and engine-independent.
    */
  def jaccard(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB)).cast("double")
    val uni = (size(setA) + size(setB)).cast("double") - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** SimHash (64-bit) over a token array: sign-sum of per-token hashes,
    * bit by bit. Docs with small Hamming distance are near-dups.
    */
  def simHash64(tokens: Column): Column = {
    val bits = (0 until 64).map { b =>
      val vote = aggregate(tokens, lit(0),
        (acc, t) => acc + when(
          xxhash64(t).bitwiseAND(shiftleft(lit(1L), b)) =!= 0, lit(1))
          .otherwise(lit(-1)))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
