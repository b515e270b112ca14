package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.plans.{TopKPerKey, TopKPerKeyStrategy}

/** W3/W4 "best k per group" as a first-class operator.
  *
  * On a session built with `GraftExtensions`, plans the custom
  * [[graft.plans.TopKPerKey]] logical node → bounded-heap physical operator
  * (no per-partition sort; memory O(k·keys), not O(rows-per-key) — see the
  * scaladoc there). On a vanilla session, falls back to the equivalent
  * `row_number()` window composition, so the result is identical either way
  * and the library never emits an unplannable node.
  */
object TopK {

  /** Keep the k best rows per key group, appending `rankName` (1 = best).
    *
    * @param order (column name, ascending?) pairs; the combined order should
    *              be total (add a tiebreak column) for fully deterministic
    *              output — same contract as a `row_number` window.
    * @param useHeap opt out of the bounded-heap physical operator. The heaps
    *              live outside Spark's memory manager with no spill path
    *              (O(k·keys) rows must fit executor memory) — right for
    *              rank-over-bounded-key sets, wrong for NEAR-UNIQUE keys per
    *              partition. Pass `useHeap = false` there to get the
    *              spillable sort-based window plan; results are identical.
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int,
      rankName: String = "rank",
      useHeap: Boolean = true): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty && k >= 1,
      s"need keys, order and k >= 1 (got keys=$keys order=$order k=$k)")
    // the extension path APPENDS rankAttr while the window path REPLACES an
    // existing column — a pre-existing name would give the two paths
    // different schemas (and ambiguous downstream select(rankName))
    require(!df.columns.contains(rankName),
      s"input already has a column named '$rankName' — pass a different rankName")
    val spark = df.sparkSession
    if (useHeap &&
        GraftExpressionBridge.hasStrategy(spark, TopKPerKeyStrategy.getClass)) {
      val child = df.queryExecution.analyzed
      def attr(name: String) = {
        val exact = child.output.filter(_.name == name)
        val matches = if (exact.nonEmpty) exact
          else child.output.filter(_.name.equalsIgnoreCase(name))
        if (matches.size > 1) throw new IllegalArgumentException(
          s"column '$name' is ambiguous (${matches.size} matches) — disambiguate " +
            "before TopK.perKey (the window fallback would throw AMBIGUOUS_REFERENCE " +
            "for the same input; silently picking one side would rank wrong data)")
        matches.headOption.getOrElse(throw new IllegalArgumentException(
          s"column '$name' not found among ${child.output.map(_.name).mkString(", ")}"))
      }
      val sortOrder = order.map { case (name, asc) =>
        SortOrder(attr(name), if (asc) Ascending else Descending)
      }
      val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
      GraftExpressionBridge.ofRows(spark,
        TopKPerKey(keys.map(attr), sortOrder, k, rankAttr, child))
    } else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(order.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }: _*)
      df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
    }
  }

  /** Column-expression variant used by tests; resolves via the DataFrame. */
  def perKeyCols(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      rankName: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
  }
}
