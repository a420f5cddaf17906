package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * For each left row, attach the payload of the right row with the largest
  * `rightTime <= leftTime` within the same key. Implemented by composing
  * built-ins (preference (a) of the custom-operator ladder): union both
  * sides, one shuffle on the key, one in-partition sort, and a
  * `last(_, ignoreNulls)` running window. This is the same work a dedicated
  * sort-merge as-of join would do — O(n log n) per partition, no broadcast
  * of either side, no range cross-join — so it scales to 100 TB with
  * exactly one shuffle of each input.
  *
  * Equivalent to DuckDB's `ASOF LEFT JOIN` (used as the oracle), including
  * its SQL comparison semantics: the whole payload comes from ONE matched
  * right row (carried as a struct — per-column fills could stitch values
  * from different rows when the newest row holds legitimate NULLs), and a
  * NULL join key or NULL timestamp on either side matches nothing.
  */
object AsOfJoin {

  /** @param left      left rows (kept in full)
    * @param right     right rows
    * @param keyCols   equi-join keys present in both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   output name -> right column to attach
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Map[String, String]
  ): DataFrame =
    join(left, right, keyCols, leftTime, rightTime, payload, forward = false)

  /** Forward (earliest-subsequent) variant: for each left row, attach the
    * right row with the SMALLEST `rightTime >= leftTime` in the same key —
    * e.g. each click gets the user's next purchase. Same single-shuffle
    * union + running-window mechanics, with the time order reversed.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Map[String, String]
  ): DataFrame =
    join(left, right, keyCols, leftTime, rightTime, payload, forward = true)

  /** Native-plan variant: same contract, executed by the dedicated
    * Catalyst operator ([[graft.plans.AsOfJoinNode]] →
    * [[graft.plans.AsOfJoinExec]]) instead of the union+window
    * composition — one hash-cluster + sort per side and a streaming
    * single-candidate merge per partition. Registered on the session's
    * `experimental.extraStrategies` idempotently (cluster deployments can
    * instead set `spark.sql.extensions=graft.functions.GraftExtensions`).
    */
  def native(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Map[String, String],
      forward: Boolean = false
  ): DataFrame = {
    import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val outCols = payload.keys.toSeq.sorted
    val collisions = outCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"payload output names collide with left columns: ${collisions.mkString(", ")}")
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    AsOfJoin.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // Self-prune the right side to keys + time + payload sources: generic
    // column pruning doesn't descend through an unknown logical node, so
    // the node's builder keeps the scan narrow itself.
    val srcCols = ((keyCols :+ rightTime) ++ outCols.map(payload)).distinct
    val rp0 = right.select(srcCols.map(col): _*).queryExecution.analyzed
    val lp = left.queryExecution.analyzed
    // Self-join safety: when both sides derive from the same relation the
    // children share expression IDs; DeduplicateRelations re-IDs the right
    // subtree but cannot rewrite the references held by an unknown node.
    // Minting fresh right-side attributes behind an alias projection keeps
    // this node's references stable through that rewrite.
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(
      rp0.output.map(a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    def attr(outp: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
        n: String) = outp.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    // The merge iterator compares key/time values with orderings built from
    // the LEFT side's types; mismatched types would compare garbage bytes
    // silently. Fail fast instead.
    keyCols.foreach { k =>
      val (lt, rt) = (attr(lp.output, k).dataType, attr(rp.output, k).dataType)
      require(lt == rt, s"as-of key '$k' type mismatch: left ${lt.sql} vs right ${rt.sql}")
    }
    locally {
      val (lt, rt) = (attr(lp.output, leftTime).dataType, attr(rp.output, rightTime).dataType)
      require(lt == rt,
        s"as-of time type mismatch: $leftTime ${lt.sql} vs $rightTime ${rt.sql}")
    }
    val payloadAttrs = outCols.map(o => attr(rp.output, payload(o)))
    val payloadOut = outCols.zip(payloadAttrs).map { case (o, a) =>
      AttributeReference(o, a.dataType, nullable = true)() }
    val node = AsOfJoinNode(lp, rp,
      keyCols.map(attr(lp.output, _)), keyCols.map(attr(rp.output, _)),
      attr(lp.output, leftTime), attr(rp.output, rightTime),
      payloadAttrs, payloadOut, forward)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }

  private def join(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Map[String, String],
      forward: Boolean
  ): DataFrame = {
    val ordCol = "__asof_t"
    val sideCol = "__asof_side"
    val pCol = "__asof_p"
    val leftCols = left.columns.toSeq
    val outCols = payload.keys.toSeq.sorted
    val collisions = outCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"payload output names collide with left columns: ${collisions.mkString(", ")}")

    // Right rows sort *before* left rows at equal timestamps (in the
    // window's traversal direction) so a right event at exactly t
    // qualifies — inclusive semantics on both directions. A right row with
    // a NULL timestamp can never satisfy the comparison and is dropped up
    // front (under ASC it would otherwise sort first and leak its payload
    // into every unmatched left row). The payload travels as ONE struct so
    // the match is a whole right row, never a per-column mix.
    val taggedRight = right
      .filter(col(rightTime).isNotNull)
      .select(keyCols.map(col) ++ Seq(
        col(rightTime).as(ordCol), lit(0).as(sideCol),
        struct(outCols.map(o => col(payload(o)).as(o)): _*).as(pCol)): _*)
    val taggedLeft = left
      .withColumn(ordCol, col(leftTime))
      .withColumn(sideCol, lit(1))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(
        if (forward) col(ordCol).desc else col(ordCol).asc,
        col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // SQL comparison semantics: a NULL key or NULL left timestamp matches
    // nothing (the window's partitioning WOULD group NULL keys together,
    // and a NULL left time sorts to one end of the traversal — both must
    // be masked, not matched).
    val validLeft = (col(leftTime).isNotNull +: keyCols.map(col(_).isNotNull))
      .reduce(_ && _)
    val matched = unioned.withColumn(pCol,
      when(validLeft, last(col(pCol), ignoreNulls = true).over(w)))
    matched.filter(col(sideCol) === 1)
      .select(leftCols.map(col) ++
        outCols.map(o => col(pCol).getField(o).as(o)): _*)
  }
}
