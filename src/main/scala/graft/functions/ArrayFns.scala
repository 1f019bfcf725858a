package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OpenEO array sub-language over Spark `ArrayType` columns — the payloads of
  * apply_dimension / reduce_dimension callbacks
  * (reference: openeo_processes_dask/process_implementations/arrays.py).
  *
  * Everything here is higher-order-function Column algebra (codegen'd,
  * executor-side); nothing materialises on the driver — unlike the
  * reference, whose sort/modify paths force `.compute()` above 50M elements
  * (reference: arrays.py:166-175,439-453,508-513).
  *
  * OpenEO indices are 0-based; Spark's element_at/array_position are
  * 1-based — converted at this boundary.
  */
object ArrayFns {

  /** take by 0-based index (reference: arrays.py:66-122). */
  def arrayElement(arr: Column, index: Int): Column = element_at(arr, index + 1)

  /** tile `repeat` times (reference: arrays.py:125-130). */
  def arrayCreate(data: Column, repeat: Int = 1): Column =
    flatten(array_repeat(data, repeat))

  /** labels→values map (reference: arrays.py:133-141). */
  def arrayCreateLabeled(data: Column, labels: Column): Column =
    map_from_arrays(labels, data)

  /** splice: replace `length` elements at 0-based `index` with `values`
    * (reference: arrays.py:144-186).
    */
  def arrayModify(arr: Column, values: Column, index: Int, length: Int): Column =
    concat(slice(arr, 1, index), values,
      slice(arr, lit(index + length + 1), size(arr)))

  /** reference: arrays.py:189-225. */
  def arrayConcat(a1: Column, a2: Column): Column = concat(a1, a2)

  /** reference: arrays.py:228-265. */
  def arrayAppend(arr: Column, value: Column): Column = concat(arr, array(value))

  /** membership; null → false (reference: arrays.py:268-282). */
  def arrayContains(arr: Column, value: Column): Column =
    coalesce(array_contains(arr, value), lit(false))

  /** 0-based index of first match, null when absent
    * (reference: arrays.py:285-324; `reverse=true` finds the last match).
    */
  def arrayFind(arr: Column, value: Column, reverse: Boolean = false): Column = {
    val a = if (reverse) org.apache.spark.sql.functions.reverse(arr) else arr
    val pos1 = array_position(a, value) // 1-based, 0 when absent
    val idx = when(pos1 === 0, lit(null)).otherwise(pos1 - 1)
    if (reverse) when(idx.isNotNull, size(arr) - 1 - idx).otherwise(lit(null)) else idx
  }

  /** 0-based index of first element satisfying `pred`, null when absent —
    * the predicate form of array_find used by filter/find callbacks.
    */
  def arrayFindWhere(arr: Column, pred: Column => Column): Column = {
    val pos1 = array_position(transform(arr, x => pred(x)), lit(true))
    when(pos1 === 0, lit(null)).otherwise(pos1 - 1)
  }

  /** 0-based index of a label in a label array, null when absent
    * (reference: arrays.py:327-334).
    */
  def arrayFindLabel(labels: Column, label: Column): Column = {
    val pos1 = array_position(labels, label)
    when(pos1 === 0, lit(null)).otherwise(pos1 - 1)
  }

  /** labels, else 0..n-1 (reference: arrays.py:370-384). */
  def arrayLabels(arr: Column): Column = sequence(lit(0), size(arr) - 1)

  /** map a scalar callback over elements (reference: arrays.py:387-402). */
  def arrayApply(arr: Column, fn: Column => Column): Column = transform(arr, fn)

  /** filter by predicate callback (reference: arrays.py:337-367). */
  def arrayFilter(arr: Column, pred: Column => Column): Column =
    filter(arr, x => pred(x))

  /** any element truthy (used by callbacks; see Reducers.anyR for the
    * reducer form).
    */
  def arrayAny(arr: Column, pred: Column => Column): Column =
    exists(arr, x => pred(x))

  /** sorted copy; nodata placement: numpy keeps NaN at the END for BOTH
    * directions (reference: arrays.py:558-584). Ascending matches Spark's
    * native array_sort; descending needs a comparator (reverse(array_sort)
    * would move nulls to the front).
    */
  def arraySort(arr: Column, ascending: Boolean = true): Column =
    if (ascending) array_sort(arr)
    else array_sort(arr, (l, r) =>
      when(l.isNull && r.isNull, lit(0))
        .when(l.isNull, lit(1))
        .when(r.isNull, lit(-1))
        .when(l < r, lit(1)).when(l > r, lit(-1)).otherwise(lit(0)))

  /** permute along the array by a 0-based index array
    * (reference: arrays.py:538-555).
    */
  def rearrange(arr: Column, order: Column): Column =
    transform(order, i => element_at(arr, i.cast("int") + 1))

  /** exact fold-sum for integer-valued arrays (order-independent while the
    * running sum is < 2^53).
    */
  def arraySumExact(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x.cast("long"))

  /** `order`: the 0-based permutation that sorts the array — numpy argsort
    * with stable ties (reference: arrays.py:510-535). Nulls are removed
    * (the process' nodata=null default).
    */
  def orderIndices(arr: Column, ascending: Boolean = true): Column = {
    val paired = filter(
      zip_with(arr, sequence(lit(0), size(arr) - 1),
        (v, i) => struct(v.as("v"), i.as("i"))),
      s => s.getField("v").isNotNull)
    val sorted = array_sort(paired, (l, r) => {
      val (lv, rv) = (l.getField("v"), r.getField("v"))
      val tie = when(l.getField("i") < r.getField("i"), lit(-1)).otherwise(lit(1))
      if (ascending) when(lv < rv, lit(-1)).when(lv > rv, lit(1)).otherwise(tie)
      else when(lv < rv, lit(1)).when(lv > rv, lit(-1)).otherwise(tie)
    })
    transform(sorted, _.getField("i"))
  }

  /** first/last over an array (reference: arrays.py:461-508):
    * ignore_nodata skips nulls; the strict form reads the raw end cells.
    * `get`/size-guarded access returns null on an all-null array instead of
    * raising (ANSI-safe).
    */
  def arrayFirst(arr: Column, ignoreNodata: Boolean = true): Column =
    if (ignoreNodata) get(filter(arr, _.isNotNull), lit(0)) else get(arr, lit(0))
  def arrayLast(arr: Column, ignoreNodata: Boolean = true): Column = {
    if (ignoreNodata) {
      val nn = filter(arr, _.isNotNull)
      get(nn, size(nn) - 1)
    } else get(arr, size(arr) - 1)
  }
}
