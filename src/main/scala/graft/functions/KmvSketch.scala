package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator
  * (SURVEY.md §2.11 "novel sketch" slot).
  *
  * The buffer keeps the k smallest DISTINCT hash values seen; the estimate
  * is (k-1)*M / h_k (hashes uniform on [0, M)). Unlike HLL
  * (approx_count_distinct), every step is deterministic integer math over a
  * shared hash — min-set union is associative/commutative, so ANY
  * partial-aggregation merge order yields the same buffer, and the estimate
  * is reproducible in DuckDB SQL: this sketch is exact-oracle-checkable.
  * Buffer is O(k); merge is a sorted-array merge — the mergeability that
  * makes sketches work at 100 TB (map-side partials, tiny shuffle).
  */
case class KmvBuf(hs: Array[Long])

class KmvDistinct(k: Int, m: Long) extends Aggregator[Long, KmvBuf, Long] {
  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val arr = b.hs
    val pos = java.util.Arrays.binarySearch(arr, h)
    if (pos >= 0) b // already present
    else if (arr.length < k) {
      val ins = -pos - 1
      val out = new Array[Long](arr.length + 1)
      System.arraycopy(arr, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(arr, ins, out, ins + 1, arr.length - ins)
      KmvBuf(out)
    } else if (h < arr(k - 1)) {
      val ins = -pos - 1
      val out = new Array[Long](k)
      System.arraycopy(arr, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(arr, ins, out, ins + 1, k - ins - 1)
      KmvBuf(out)
    } else b
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    val x = a.hs; val y = b.hs
    val out = new Array[Long](math.min(k, x.length + y.length))
    var i = 0; var j = 0; var n = 0
    // explicit first-element flag: a Long.MinValue sentinel would silently
    // drop a legitimate leading Long.MinValue hash under a full-range hash
    var hasLast = false
    var last = 0L
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      if (!hasLast || v != last) { out(n) = v; n = n + 1; last = v; hasLast = true }
    }
    KmvBuf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override def finish(b: KmvBuf): Long =
    if (b.hs.length < k) b.hs.length.toLong
    else (k - 1).toLong * m / b.hs(k - 1)

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
