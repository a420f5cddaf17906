package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Error type for graph-construction-time validation failures.
  *
  * Matches the reference's eager, driver-side error reporting: bad maps,
  * reduces, or splices fail at the call site, never at execution
  * (reference: src/cyclebane/graph.py:316-334, node_values.py:54-93).
  */
final class GraftException(msg: String) extends IllegalArgumentException(msg)

/** One `map` call's parameter table: a set of dims backed by one DataFrame.
  *
  * The Spark translation of the reference's `ValueArray`/`NodeValues` pair
  * (reference: src/cyclebane/value_array.py:16-105, node_values.py:17-129).
  * An N-D array-like is held in long/tidy form: one label column per dim
  * plus one value column per jointly-mapped node. Columns jointly mapped in
  * one call share the dims (zip semantics, node_values.py:95-110); separate
  * `map` calls create independent `DimGroup`s whose dims cross-multiply at
  * shared descendants.
  *
  * A dim absent from `labelCols` is *positional* (range labels 0..n-1, like
  * the reference's `SequenceAdapter`, value_array_adapters.py:23-68): its
  * labels are materialized lazily via `zipWithIndex` only when actually
  * observed, because at 100 TB a row-position column is an extra full pass
  * we refuse to pay unless the query semantics demand it.
  */
final case class DimGroup(
    dims: Vector[String],
    df: DataFrame,
    valueCols: Map[String, String],
    labelCols: Map[String, String]
) {
  require(dims.nonEmpty, "DimGroup needs at least one dim")
  require(dims.count(d => !labelCols.contains(d)) <= (if (dims.size == 1) 1 else 0),
    "positional (label-less) dims are only supported for 1-D groups; " +
      "N-D groups must label every dim (tidy form)")

  def positionalDim: Option[String] = dims.find(d => !labelCols.contains(d))

  /** df extended with the positional-label column for the positional dim.
    * An in-memory (LocalRelation) param table gets positions driver-side
    * and STAYS a LocalRelation — eligible for eager label validation and
    * broadcast planning. Anything else uses RDD zipWithIndex:
    * distributed, deterministic for a deterministic source, no
    * single-partition window.
    */
  lazy val withPositions: DataFrame = positionalDim match {
    case None => df
    case Some(d) =>
      val spark = df.sparkSession
      val schema = df.schema.add(TaskGraph.posCol(d), LongType, nullable = false)
      val isLocal = TaskGraph.isLocalPlan(df)
      if (isLocal) {
        val rows = df.collect().zipWithIndex.map {
          case (r, i) => Row.fromSeq(r.toSeq :+ i.toLong)
        }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      } else {
        val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
        spark.createDataFrame(rdd, schema)
      }
  }

  /** The group's frame: value columns renamed to node names, label columns
    * renamed to dim names. Positional labels only materialized on request.
    */
  def frame(needPositional: Boolean): DataFrame = {
    val base = if (needPositional && positionalDim.isDefined) withPositions else df
    val dimCols = dims.flatMap { d =>
      if (labelCols.contains(d)) Some(col(labelCols(d)).as(d))
      else if (needPositional) Some(col(TaskGraph.posCol(d)).as(d))
      else None
    }
    val nodeCols = valueCols.toSeq.sortBy(_._1).map { case (n, c) => col(c).as(n) }
    base.select(dimCols ++ nodeCols: _*)
  }

  /** Labels of one dim, in array order (for re-map validation). */
  def labelFrame(dim: String): DataFrame =
    (if (labelCols.contains(dim)) df.select(col(labelCols(dim)).as(dim))
     else withPositions.select(col(TaskGraph.posCol(dim)).as(dim)))

  /** Positional slice [lo, hi) of `dim` (reference graph.py:154-178).
    * Labels follow the slice — the original labels survive
    * (graph_test.py:970-1038).
    *
    * For a labeled IN-MEMORY dim, position is the label's order of first
    * appearance in row order — exact reference parity (array/iloc
    * semantics: a pandas index [30, 10, 20] has 30 at position 0), with
    * duplicate labels sharing their first position and rows of other
    * dims in an N-D tidy frame never counted as positions. For a labeled
    * FILE-BACKED dim, physical row order across partitions carries no
    * meaning, so position falls back to rank among the distinct labels
    * in ascending order — the stable, scale-safe semantics; the ranking
    * runs over the dim-table-sized distinct label set via distributed
    * sort + zipWithIndex (never a single-partition window over
    * fact-scale data) and the kept labels semi-join back broadcast. The
    * positional dim uses true array order via zipWithIndex.
    */
  def sliceByPosition(dim: String, lo: Int, hi: Int): DimGroup = {
    require(dims.contains(dim), s"dim '$dim' not in group")
    labelCols.get(dim) match {
      case None =>
        val pc = TaskGraph.posCol(dim)
        val sliced = withPositions.filter(col(pc) >= lo && col(pc) < hi)
        // The dim keeps its original positional labels; they become
        // explicit (the dim is now label-backed by the old positions).
        copy(df = sliced, labelCols = labelCols + (dim -> pc))
      case Some(lc) if TaskGraph.isLocalPlan(df) =>
        // in-memory: first-appearance order, computed driver-side (the
        // table is metadata-scale by definition of LocalRelation)
        val ordered = df.select(col(lc)).collect().map(_.get(0)).distinct
        val keptVals = ordered.slice(lo, hi)
        val spark = df.sparkSession
        val schema = StructType(Seq(
          StructField("__lbl", df.select(col(lc)).schema.head.dataType)))
        val kept = spark.createDataFrame(
          java.util.Arrays.asList(keptVals.map(v => Row(v)): _*), schema)
        // null-safe: a null label is a real label and must match itself
        copy(df = df.join(broadcast(kept), col(lc) <=> col("__lbl"), "left_semi"))
      case Some(lc) =>
        val distinctLabels = df.select(col(lc).as("__lbl")).distinct()
        val spark = df.sparkSession
        val sorted = distinctLabels.orderBy("__lbl")
        val schema = sorted.schema.add("__rank", LongType, nullable = false)
        val ranked = spark.createDataFrame(
          sorted.rdd.zipWithIndex().map { case (r, i) =>
            Row.fromSeq(r.toSeq :+ i)
          }, schema)
        val kept = ranked
          .filter(col("__rank") >= lo && col("__rank") < hi)
          .drop("__rank")
        copy(df = df.join(broadcast(kept), col(lc) <=> col("__lbl"), "left_semi"))
    }
  }

  /** A label value as a literal column. A `(value, unit)` pair becomes a
    * struct literal matching [[TaskGraph.unitCoord]]'s encoding, so label
    * equality on a unit-carrying dim includes the unit (reference scipp
    * adapter: sel reconstructs `scalar(value, unit=unit)`,
    * value_array_adapters.py:212-225, 241-250).
    */
  private def labelLit(label: Any): Column = label match {
    case (v, u: String) => struct(lit(v).as("value"), lit(u).as("unit"))
    case other => lit(other)
  }

  /** Label-based point selection on `dim` (reference value_array.py:56-58). */
  def selLabel(dim: String, label: Any): DimGroup = {
    require(dims.contains(dim), s"dim '$dim' not in group")
    labelCols.get(dim) match {
      case Some(lc) => copy(df = df.filter(col(lc) === labelLit(label)))
      case None =>
        val pc = TaskGraph.posCol(dim)
        copy(df = withPositions.filter(col(pc) === lit(label)),
          labelCols = labelCols + (dim -> pc))
    }
  }

  /** Label-range slice [lo, hi) on `dim` (reference value_array.py:60-71).
    * For unit-carrying bounds the unit participates as EQUALITY, not as
    * part of the lexicographic range — a struct range comparison alone
    * would order by value first and silently treat 2 s as inside
    * [1 ms, 3 ms). Both bounds must carry the same unit.
    */
  def sliceByLabel(dim: String, lo: Any, hi: Any): DimGroup = {
    require(dims.contains(dim), s"dim '$dim' not in group")
    val lc = labelCols.getOrElse(dim,
      throw new GraftException(s"dim '$dim' is positional; use sliceByPosition"))
    (lo, hi) match {
      case ((lv, lu: String), (hv, hu: String)) =>
        if (lu != hu)
          throw new GraftException(
            s"loc bounds must share one unit, got '$lu' and '$hu'")
        copy(df = df.filter(col(lc).getField("unit") === lit(lu) &&
          col(lc).getField("value") >= lit(lv) &&
          col(lc).getField("value") < lit(hv)))
      case _ =>
        copy(df = df.filter(col(lc) >= labelLit(lo) && col(lc) < labelLit(hi)))
    }
  }
}

/** How a reduce-style node derives from its predecessor.
  *
  * @param pred     the reduced node
  * @param reduced  dims consumed by this reduce (dims of `pred` at creation
  *                 time for reduce-all; later-mapped dims pass through, as
  *                 in the reference where later maps relabel reduce nodes)
  * @param groupKey for `groupby(col).reduce(...)`: the key node whose values
  *                 become the new dim's labels (reference graph.py:540-592)
  */
final case class ReduceSpec(
    pred: String,
    reduced: Vector[String],
    groupKey: Option[String]
)

/** The engine's task graph: an immutable DAG of named nodes over lazy
  * DataFrame parameter tables.
  *
  * This is the Spark-native equivalent of the reference's `Graph`
  * (src/cyclebane/graph.py:184-592). The reference only rewrites graph
  * metadata and delegates execution; here the same driver-side metadata
  * moves are kept (cheap, eager-validated), but `result`/`taskTable`
  * *execute* the expanded plan as DataFrame dataflows — Catalyst plans the
  * joins/aggregations, so the Cartesian node expansion the reference
  * performs driver-side (graph.py:367-424) never materializes: it stays a
  * lazy relational plan that scales out.
  *
  * Node execution semantics:
  *  - mapped source node: value column of its `DimGroup`.
  *  - derived node with attr "expr": SQL expression over its predecessors'
  *    value columns (the engine's executable payload; the reference carries
  *    opaque attrs for an external scheduler, graph.py:285,311).
  *  - derived node without "expr": pass-through (single pred) or
  *    struct(preds).
  *  - reduce node: aggregate attr "func" (sum/min/max/count/avg/...) over
  *    the consumed dims; default is the order-stable structural collect
  *    `sort_array(collect_list(...))` for reference fan-in parity.
  */
final case class TaskGraph(
    dag: Dag,
    groups: Vector[DimGroup],
    reduces: Map[String, ReduceSpec]
) {

  // ---------------------------------------------------------------- catalog

  /** node -> group index for mapped source nodes. */
  lazy val mappedNode: Map[String, Int] =
    groups.zipWithIndex.flatMap { case (g, i) => g.valueCols.keys.map(_ -> i) }.toMap

  def isMapped(n: String): Boolean = mappedNode.contains(n)

  /** Groupby-created dims (named after their key node), insertion-ordered. */
  lazy val groupbyDims: Vector[String] =
    dag.nodeList.flatMap(n => reduces.get(n).flatMap(_.groupKey)).distinct

  /** Global dim ordering for derived-node dim tuples: later map calls
    * *prepend* their dims (reference graph.py:109-112: `indices +
    * node.indices`), so map dims rank newest-first (group order preserved
    * within one call); groupby dims go last (axis-order rule, reference
    * groupby_test.py:771-824).
    */
  private lazy val dimRank: Map[String, Int] =
    (groups.reverse.flatMap(_.dims) ++ groupbyDims).zipWithIndex.toMap

  /** Dims of each node, outermost first. */
  lazy val nodeDims: Map[String, Vector[String]] = {
    val m = scala.collection.mutable.Map.empty[String, Vector[String]]
    dag.topologicalOrder.foreach { n =>
      if (isMapped(n)) m(n) = groups(mappedNode(n)).dims
      else reduces.get(n) match {
        case Some(spec) =>
          val predDims = m.getOrElse(spec.pred, Vector.empty)
          val kept = predDims.filterNot(spec.reduced.contains)
          val dims = spec.groupKey.fold(kept)(k => kept :+ k)
          if (dims.nonEmpty) m(n) = dims
        case None =>
          val ds = dag.predecessors(n).flatMap(p => m.getOrElse(p, Vector.empty)).distinct
          if (ds.nonEmpty) m(n) = ds.sortBy(d => dimRank.getOrElse(d, Int.MaxValue))
      }
    }
    m.toMap
  }

  def dimsOf(n: String): Vector[String] = nodeDims.getOrElse(n, Vector.empty)

  /** All dims of the graph, in insertion order (reference graph.py:229-237).
    * A dim may be backed by several groups (shared index name, validated
    * label-equal) or by a group and a groupby — it is listed once.
    */
  def indexNames: Vector[String] = (groups.flatMap(_.dims) ++ groupbyDims).distinct

  /** Distinct labels of a dim, as a single-column DataFrame named after the
    * dim. Stays lazy — label sets can be fact-table-sized.
    */
  def indices(dim: String): DataFrame =
    groups.find(_.dims.contains(dim)) match {
      case Some(g) => g.frame(needPositional = true).select(dim).distinct()
      case None if groupbyDims.contains(dim) => result(dim).select(dim).distinct()
      case None => throw new GraftException(s"unknown dim '$dim'")
    }

  // ------------------------------------------------------------------- map

  /** Map source nodes over columns of a DataFrame (joint map: all columns
    * share one new dim — zip semantics, reference node_values.py:95-110).
    * Node names not yet in the graph are auto-added as sources (the
    * labels-for-later-groupby pattern, reference graph.py:260-263); mapping
    * a non-source node raises (graph.py:127-135).
    *
    * @param df       parameter table
    * @param nodes    node name -> column name in df (default: every column
    *                 except `indexCol`, mapped to the same-named node)
    * @param indexCol label column for the new dim; None = positional labels
    * @param dimName  name of the new dim; default `dim_<axis_zero>` with
    *                 axis_zero = number of existing dims (graph.py:255-257)
    */
  def mapFrame(
      df: DataFrame,
      nodes: Map[String, String] = null,
      indexCol: Option[String] = None,
      dimName: String = null
  ): TaskGraph = {
    val nodeMap = Option(nodes).getOrElse {
      df.columns.filterNot(indexCol.contains).map(c => c -> c).toMap
    }
    val dim = Option(dimName).getOrElse {
      // axis_zero naming (graph.py:255-257), skipping collisions
      Iterator.from(indexNames.size).map(i => s"dim_$i")
        .find(d => !indexNames.contains(d)).get
    }
    addGroup(DimGroup(
      dims = Vector(dim),
      df = df,
      valueCols = nodeMap,
      labelCols = indexCol.map(dim -> _).toMap))
  }

  /** Map a single node over an N-D array-like in tidy form: `dimLabels`
    * gives (dim name -> label column) outermost first (reference N-D
    * adapters, value_array_adapters.py:141-316).
    */
  def mapND(
      node: String,
      df: DataFrame,
      dimLabels: Seq[(String, String)],
      valueCol: String
  ): TaskGraph =
    addGroup(DimGroup(
      dims = dimLabels.map(_._1).toVector,
      df = df,
      valueCols = Map(node -> valueCol),
      labelCols = dimLabels.toMap))

  /** Adapter dispatch (reference `ValueArray.from_array_like` registry,
    * value_array.py:26-39): route each mapped value to the right
    * ingestion path by shape —
    *  - a `DataFrame` is a mapping of columns (the pandas-DataFrame rule):
    *    every column becomes a node, jointly mapped on one fresh dim;
    *  - a `Map[String, Seq[_]]` -> [[mapSeqs]] (the sequence adapter: one
    *    shared positional dim, zip semantics). A nested `Seq` element is a
    *    VALUE, not an extra dim — the reference sequence adapter does not
    *    descend into nested plain lists (graph_test.py:132-139); N-D
    *    ingestion is the EXPLICIT ndarray-equivalent path,
    *    [[mapNestedSeqs]] / [[mapND]].
    */
  def map(values: Any)(implicit spark: SparkSession): TaskGraph = values match {
    case df: DataFrame => mapFrame(df)
    case m: Map[_, _] =>
      val named = m.asInstanceOf[Map[String, Any]]
      require(named.nonEmpty, "empty map")
      mapSeqs(named.map { case (k, v) => k -> v.asInstanceOf[Seq[Any]] })
    case other =>
      throw new GraftException(s"cannot map value of type ${other.getClass.getName}")
  }

  /** Map nodes over N-D nested sequences (reference `NumpyArrayAdapter`,
    * value_array_adapters.py:257-316): dims are `dim_{axis_zero+i}` with
    * default range coords per axis; all values in one call must have the
    * same shape and share the dims (node_values.py:104-109). The nested
    * structure is flattened to tidy form driver-side — parameter values
    * passed as in-memory literals are metadata-scale by definition (large
    * arrays come in as DataFrames via mapND).
    */
  def mapNestedSeqs(values: Map[String, Seq[Any]])(implicit spark: SparkSession): TaskGraph = {
    def shapeOf(v: Any): Vector[Int] = v match {
      case s: Seq[_] =>
        // validate every sibling, not just the head: ragged input must
        // raise (the reference ndarray adapter cannot represent it), not
        // silently drop or misassign values
        val sub = s.map(shapeOf).distinct
        if (sub.size > 1)
          throw new GraftException(
            "ragged nested sequence: all slices of one axis must have the same shape")
        s.size +: sub.headOption.getOrElse(Vector.empty)
      case _ => Vector.empty
    }
    val names = values.keys.toVector.sorted
    val shapes = names.map(n => shapeOf(values(n))).toSet
    if (shapes.size != 1)
      throw new GraftException(
        "All value sequences in a map operation must have the same shape. " +
          "Use multiple map operations if necessary.")
    val shape = shapes.head
    def flatten(v: Any): Vector[Any] = v match {
      case s: Seq[_] => s.toVector.flatMap(flatten)
      case x => Vector(x)
    }
    val flat = names.map(n => flatten(values(n)))
    val n = shape.product
    // multi-index in row-major order, like numpy
    val indices = (0 until n).map { i =>
      shape.scanRight(1)(_ * _).tail.zip(shape).map { case (stride, len) =>
        (i / stride) % len
      }
    }
    val axisZero = indexNames.size
    val dims = shape.indices.map(i => s"dim_${axisZero + i}").toVector
    val rows = (0 until n).map(i =>
      Row.fromSeq(indices(i) ++ names.zipWithIndex.map { case (_, j) => flat(j)(i) }))
    val schema = StructType(
      dims.map(d => StructField(d, org.apache.spark.sql.types.IntegerType)) ++
        names.map(nm => StructField("__v_" + nm, TaskGraph.sparkTypeOf(flat(names.indexOf(nm))))))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    addGroup(DimGroup(
      dims = dims,
      df = df,
      valueCols = names.map(nm => nm -> ("__v_" + nm)).toMap,
      labelCols = dims.map(d => d -> d).toMap))
  }

  /** Map nodes over in-memory sequences (reference `SequenceAdapter`,
    * value_array_adapters.py:23-68): all sequences share one positional dim
    * and must have equal length (node_values.py:104-109).
    */
  def mapSeqs(values: Map[String, Seq[Any]])(implicit spark: SparkSession): TaskGraph = {
    require(values.nonEmpty, "empty map")
    val sizes = values.values.map(_.size).toSet
    if (sizes.size > 1)
      throw new GraftException(
        "All value sequences in a map operation must have the same shape. " +
          "Use multiple map operations if necessary.")
    val names = values.keys.toVector.sorted
    val rows = (0 until sizes.head).map(i => Row.fromSeq(names.map(n => values(n)(i))))
    val schema = StructType(names.map(n => StructField(n, TaskGraph.sparkTypeOf(values(n)))))
    // LocalRelation (not an RDD): in-memory param tables stay eligible
    // for eager label validation and broadcast planning
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    mapFrame(df, names.map(n => n -> n).toMap, indexCol = None)
  }

  private def addGroup(group0: DimGroup): TaskGraph = {
    // Re-map detection runs BEFORE dim-collision validation so an
    // identical re-map with the same explicit dim name is a no-op, not a
    // "dim already exists" error (reference node_values.py:54-93).
    var d = dag
    var gs = groups
    var freshCols = group0.valueCols
    val remapDims = scala.collection.mutable.Set.empty[String]
    // A re-mapped node must keep its ORIGINAL dim names — otherwise a
    // replace would detach it from its co-mapped siblings' shared dim and
    // turn zip alignment into a silent cross product. All re-mapped nodes
    // in one call must therefore come from groups with the same dims.
    var renameTo: Option[Vector[String]] = None
    group0.valueCols.foreach { case (n, _) =>
      if (d.contains(n)) {
        if (d.predecessors(n).nonEmpty)
          throw new GraftException(s"Mapped node '$n' is not a source node")
        // look up the CURRENT group holding n (an earlier node of this
        // same call may already have replaced the pre-call group — a
        // lookup via the pre-call catalog would miss it)
        gs.find(_.valueCols.contains(n)).foreach { old =>
          // Re-map rules (reference node_values.py:54-93): same labels and
          // values -> no-op; same labels, new values -> replace; different
          // labels -> error. Dim names may differ when auto-generated.
          if (old.dims.size != group0.dims.size)
            throw new GraftException(s"Node '$n' has already been mapped")
          // Eager label/value equality only for metadata-scale (in-memory)
          // tables — the reference's whole universe. A file-backed re-map
          // skips the eager compare (it would be a full scan at graph-build
          // time) and takes deterministic replace semantics.
          val bothLocal =
            TaskGraph.isLocalPlan(old.df) && TaskGraph.isLocalPlan(group0.df)
          val labelsMatch = !bothLocal ||
            old.dims.zip(group0.dims).forall { case (od, nd) =>
              TaskGraph.sameData(
                old.labelFrame(od).toDF("l"), group0.labelFrame(nd).toDF("l"))
            }
          if (!labelsMatch)
            throw new GraftException(
              s"Node '$n' has already been mapped with different indices")
          // strict mode: a file-backed re-map still gets a length guard
          // (full equality stays deferred — see strictValidation)
          if (!bothLocal && TaskGraph.strictValidation(group0.df))
            old.dims.zip(group0.dims).foreach { case (od, nd) =>
              TaskGraph.requireSameLength(od,
                old.labelFrame(od), group0.labelFrame(nd))
            }
          if (renameTo.exists(_ != old.dims))
            throw new GraftException(
              "Nodes re-mapped in one call belong to groups with different dims")
          renameTo = Some(old.dims)
          remapDims ++= old.dims
          remapDims ++= group0.dims
          val valuesMatch = bothLocal && TaskGraph.sameData(
            old.df.select(col(old.valueCols(n)).as("v")),
            group0.df.select(col(group0.valueCols(n)).as("v")))
          if (valuesMatch) freshCols -= n // no-op
          else gs = gs.map(og => // replace: new mapping wins
            if (og.valueCols.contains(n)) og.copy(valueCols = og.valueCols - n)
            else og)
        }
      } else d = d.addNode(n)
    }
    // Rename the incoming group's dims to the replaced group's names so
    // the re-mapped node stays aligned with its siblings (no-op when the
    // names already agree, e.g. explicit dimName re-maps).
    val group = renameTo match {
      case Some(newDims) if newDims != group0.dims =>
        val mapping = group0.dims.zip(newDims).toMap
        group0.copy(dims = newDims,
          labelCols = group0.labelCols.map { case (dm, c) => mapping(dm) -> c })
      case _ => group0
    }
    // A dim name colliding with an existing dim is allowed when the label
    // values are identical — the dims become SHARED and descendants align
    // on them (reference node_values.py:79-90: same index name requires
    // equal index values). Conflicting labels raise.
    group.dims.filterNot(remapDims.contains).foreach { dm =>
      // Only touch a group's frame when a collision actually exists AND
      // its positional labels are free to materialize: constructing the
      // positional frame of a file-backed group is a full-scan Spark job
      // (ZippedWithIndexRDD computes partition offsets at CONSTRUCTION
      // time) that labelsCompatible's metadata-scale guard would then
      // discard anyway — fact-scale label sets defer to join semantics.
      def safeLabels(g: DimGroup): Option[DataFrame] =
        if (g.positionalDim.isEmpty || TaskGraph.isLocalPlan(g.df))
          Some(g.frame(needPositional = true).select(dm).distinct())
        else None
      val collidingGroups =
        gs.filter(og => og.valueCols.nonEmpty && og.dims.contains(dm))
      val collidesGroupby = groupbyDims.contains(dm)
      if (collidingGroups.nonEmpty || collidesGroupby) {
        val strict = TaskGraph.strictValidation(group.df)
        // strict-mode fallback labels: built even for file-backed
        // positional groups (accepts the zipWithIndex construction job)
        def allLabels(g: DimGroup): DataFrame =
          g.frame(needPositional = true).select(dm).distinct()
        safeLabels(group) match {
          case Some(newLabels) =>
            collidingGroups.foreach { og =>
              safeLabels(og) match {
                case Some(oldLabels) =>
                  if (!TaskGraph.labelsCompatible(oldLabels, newLabels))
                    throw new GraftException(
                      s"""Conflicting index values for index name "$dm"""")
                case None if strict =>
                  TaskGraph.requireSameLength(dm, allLabels(og), newLabels)
                case None => ()
              }
            }
            if (collidesGroupby &&
                !TaskGraph.labelsCompatible(indices(dm), newLabels))
              throw new GraftException(
                s"""Conflicting index values for index name "$dm"""")
          case None if strict =>
            val newLabels = allLabels(group)
            collidingGroups.foreach(og =>
              TaskGraph.requireSameLength(dm, allLabels(og), newLabels))
            if (collidesGroupby)
              TaskGraph.requireSameLength(dm, indices(dm), newLabels)
          case None => ()
        }
      }
    }
    if (freshCols.isEmpty) return copy(dag = d, groups = gs.filter(_.valueCols.nonEmpty))
    copy(dag = d, groups = gs.filter(_.valueCols.nonEmpty) :+ group.copy(valueCols = freshCols))
  }

  // ---------------------------------------------------------------- derive

  /** Add a derived node computing a SQL expression over its predecessors'
    * value columns. This is the engine's executable payload (the [ext]
    * surface); the reference's nodes carry opaque attrs consumed by
    * external schedulers (graph.py:285,311).
    */
  def withExpr(name: String, preds: Seq[String], sqlExpr: String,
      attrs: Map[String, String] = Map.empty): TaskGraph =
    withNode(name, preds, attrs + ("expr" -> sqlExpr))

  /** Merge attrs onto an EXISTING node (the reference's
    * `g.nodes[name]['attr'] = value`, graph_test.py:1041-1104); the
    * engine's preservation/merge rules (map, branch select, splice,
    * clone) then apply to them like any construction-time attrs. */
  def withAttrs(name: String, attrs: Map[String, String]): TaskGraph = {
    require(dag.contains(name), s"unknown node '$name'")
    copy(dag = dag.addNode(name, attrs))
  }

  /** Add a plain (opaque) node with edges from preds. */
  def withNode(name: String, preds: Seq[String],
      attrs: Map[String, String] = Map.empty): TaskGraph = {
    if (dag.contains(name))
      throw new GraftException(s"Node '$name' already exists in the graph.")
    var d = dag.addNode(name, attrs)
    preds.foreach { p =>
      require(d.contains(p), s"unknown predecessor '$p'")
      d = d.addEdge(p, name)
    }
    copy(dag = d)
  }

  // ---------------------------------------------------------------- reduce

  /** Add a fan-in node reducing `key` over one dim (`index` by name, `axis`
    * by position into the node's dim tuple) or all dims if neither given
    * (reference graph.py:278-341). The reduced node is kept — multiple
    * reduces of the same node coexist (graph_test.py:494-543).
    */
  def reduce(
      key: String = null,
      index: String = null,
      axis: Integer = null,
      name: String = null,
      attrs: Map[String, String] = Map.empty
  ): TaskGraph =
    reduceImpl(key, Option(index), Option(axis).map(_.intValue), name, attrs, None)

  private[core] def reduceImpl(
      key0: String, index: Option[String], axis: Option[Int],
      name0: String, attrs: Map[String, String], extraDim: Option[String]
  ): TaskGraph = {
    if (index.isDefined && axis.isDefined)
      throw new GraftException("Only one of index and axis can be given")
    val key = Option(key0).getOrElse(dag.uniqueSink)
    require(dag.contains(key), s"unknown node '$key'")
    val name = Option(name0).getOrElse(
      "reduce_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    if (dag.contains(name))
      throw new GraftException(s"Node '$name' already exists in the graph.")
    val dims = dimsOf(key)
    index.foreach { i =>
      if (!dims.contains(i))
        throw new GraftException(s"Node '$key' does not have index '$i'.")
    }
    axis.foreach { a =>
      if (a < 0 || a >= dims.size)
        throw new GraftException(s"Node '$key' does not have axis '$a'.")
    }
    val reduced: Vector[String] =
      if (index.isDefined) Vector(index.get)
      else if (axis.isDefined) Vector(dims(axis.get))
      else dims
    var d = dag.addNode(name, attrs).addEdge(key, name)
    // The groupby key node is wired as a predecessor of the reduce node so
    // that branch selection keeps the grouping alive — the engine analogue
    // of the reference storing the grouping as a node value on the reduce
    // node (graph.py:579-585) which getitem's keep-set preserves.
    extraDim.foreach(k => d = d.addEdge(k, name))
    copy(dag = d, reduces = reduces + (name -> ReduceSpec(key, reduced, extraDim)))
  }

  /** Start a value-based grouping on a mapped column (reference
    * graph.py:275-276, 540-592).
    */
  def groupby(keyNode: String): GroupbyTaskGraph = {
    if (!isMapped(keyNode))
      throw new GraftException(s"Node '$keyNode' is not mapped; cannot groupby.")
    new GroupbyTaskGraph(this, keyNode)
  }

  // --------------------------------------------------------------- slicing

  /** Positional slice [lo, hi) of `dim` before expansion: the graph shape
    * is unchanged, fewer copies materialize (reference graph.py:154-178) —
    * i.e. a predicate pushed below the whole expansion.
    */
  def byPosition(dim: String, lo: Int, hi: Int): TaskGraph =
    mapGroupsForDim(dim)(_.sliceByPosition(dim, lo, hi))

  /** Label-based point selection on `dim` (reference value_array.py:56-58). */
  def sel(dim: String, label: Any): TaskGraph =
    mapGroupsForDim(dim)(_.selLabel(dim, label))

  /** Label-range slice [lo, hi) on `dim` (reference value_array.py:60-71). */
  def loc(dim: String, lo: Any, hi: Any): TaskGraph =
    mapGroupsForDim(dim)(_.sliceByLabel(dim, lo, hi))

  private def mapGroupsForDim(dim: String)(f: DimGroup => DimGroup): TaskGraph = {
    if (groups.exists(_.dims.contains(dim)))
      return copy(groups = groups.map(g => if (g.dims.contains(dim)) f(g) else g))
    // A groupby-created dim has no DimGroup of its own: its labels ARE the
    // key node's values (reference slices the stored grouping the same
    // way). Slicing it filters the key node's parameter table through a
    // synthetic label view backed by the VALUE column — every downstream
    // expansion, including the reduce's groups, shrinks accordingly.
    if (groupbyDims.contains(dim) && isMapped(dim)) {
      return copy(groups = groups.map { g =>
        if (!g.valueCols.contains(dim)) g
        else {
          // a positional sibling dim must be label-backed for the view to
          // satisfy DimGroup's shape invariant; its labels become the old
          // positions, exactly as sliceByPosition does on positional dims
          val (baseDf, baseLabels) = g.positionalDim match {
            case Some(pd) => (g.withPositions,
              g.labelCols + (pd -> TaskGraph.posCol(pd)))
            case None => (g.df, g.labelCols)
          }
          val view = g.copy(df = baseDf, dims = g.dims :+ dim,
            labelCols = baseLabels + (dim -> g.valueCols(dim)))
          val sliced = f(view)
          sliced.copy(dims = g.dims, labelCols = sliced.labelCols - dim)
        }
      })
    }
    throw new GraftException(s"unknown dim '$dim'")
  }

  // ------------------------------------------------------------ branch ops

  /** Branch select: subgraph of `key` + all ancestors; drops node values
    * not in the branch (reference graph.py:443-461).
    */
  def getItem(key: String): TaskGraph = {
    require(dag.contains(key), s"unknown node '$key'")
    prunedDag(dag.subgraph(dag.ancestors(key) + key))
  }

  /** Branch delete: remove `key`'s exclusive ancestors (those not feeding
    * other sinks) and its attrs; `key` stays as a bare input. Refuses on
    * mapped nodes (reference graph.py:463-478, 30-53).
    */
  def delItem(key: String): TaskGraph = {
    require(dag.contains(key), s"unknown node '$key'")
    if (isMapped(key) || dimsOf(key).nonEmpty)
      throw new GraftException("Cannot delete mapped node.")
    val d1 = removeExclusiveAncestors(key)
    val pruned = prunedDag(Dag(d1.nodeList,
      d1.attrs + (key -> Map.empty[String, String]),
      d1.edgeList.filterNot(_._2 == key)))
    // the key's old DEFINITION dies with its data, not just its attrs: a
    // reduce spec can survive prunedDag when the reduced pred also feeds
    // another sink, and frameOf consults `reduces` before DAG preds — the
    // key would keep aggregating instead of becoming the bare input the
    // reference specifies (graph.py:463-478). Same rule setItem applies.
    pruned.copy(reduces = pruned.reduces - key)
  }

  /** Ancestors of `key` whose every remaining path leads only into `key`
    * are removed (reference `_remove_ancestors`, graph.py:30-53).
    */
  private def removeExclusiveAncestors(key: String): Dag = {
    val anc = dag.ancestors(key)
    val withoutKey = dag.removeNodes(Set(key))
    val toRemove = anc.filter(a => withoutKey.descendants(a).subsetOf(anc))
    dag.removeNodes(toRemove)
  }

  /** Branch replace/compose: splice `other` in at `key`, renaming `other`'s
    * unique sink to `key` (reference graph.py:480-537). Intersecting nodes
    * must have identical predecessors and attrs; node values merge with the
    * renamed sink's values preserved; mapped-on-unmapped raises.
    */
  def setItem(key: String, other: TaskGraph): TaskGraph = {
    val sink = other.dag.uniqueSink
    val sinkMapped = other.isMapped(sink) || other.dimsOf(sink).nonEmpty
    val keyMapped = dag.contains(key) && (isMapped(key) || dimsOf(key).nonEmpty)
    if (sinkMapped != keyMapped)
      throw new GraftException(
        "Trying to set mapped node on non-mapped node (or vice versa) is " +
          "not possible in setItem")
    val renamedDag = if (sink == key) other.dag else other.dag.renameNode(sink, key)
    val base: Dag =
      if (dag.contains(key)) {
        val d = removeExclusiveAncestors(key)
        // the key's old attrs die with its old definition (reference
        // _remove_ancestors clears the node's data, graph.py:30-53) — a
        // surviving "expr"/"func" attr would poison the spliced branch
        Dag(d.nodeList, d.attrs + (key -> Map.empty[String, String]),
          d.edgeList.filterNot(_._2 == key))
      } else dag
    val intersection = base.nodes.intersect(renamedDag.nodes) - key
    intersection.foreach { n =>
      if (base.predecessors(n).toSet != renamedDag.predecessors(n).toSet)
        throw new GraftException(s"Node inputs differ for node '$n'")
      if (base.attrs.getOrElse(n, Map.empty) != renamedDag.attrs.getOrElse(n, Map.empty))
        throw new GraftException(s"Node data differs for node '$n'")
    }
    val composed = base.compose(renamedDag)
    // Merge node values (node_values.py:54-93), renaming the sink's mapping
    // to `key` (graph.py:524-535).
    val renamedGroups = other.groups.map { g =>
      if (g.valueCols.contains(sink) && sink != key)
        g.copy(valueCols = (g.valueCols - sink) + (key -> g.valueCols(sink)))
      else g
    }
    val renamedReduces = other.reduces.map {
      case (n, spec) =>
        val n2 = if (n == sink) key else n
        val p2 = if (spec.pred == sink) key else spec.pred
        n2 -> spec.copy(pred = p2)
    }
    var merged = prunedDag(composed)
    // Branch REPLACE at a value-mapped key: when the incoming sink is a
    // reduce node, it becomes the key's new definition and the key's old
    // value mapping is dropped — after validating that the dim names and
    // label values align (the reference's replace-on-identical-labels
    // rule, node_values.py:54-93, exercised by the chained-groupby splice
    // pattern, groupby_test.py:50-154: `mapped['e'] = grouped` over a
    // table indexed by the earlier groupby's dim).
    if (renamedReduces.contains(key) && merged.isMapped(key)) {
      val og = merged.groups(merged.mappedNode(key))
      val newDims = other.dimsOf(sink)
      if (og.dims != newDims)
        throw new GraftException(
          s"Node '$key' has already been mapped with different indices")
      // eager label validation only when the positional frame is free to
      // build (no positional dim, or in-memory) — file-backed positional
      // labels defer to join semantics, as in addGroup; strict mode adds
      // the length guard on the deferred pairs
      og.dims.foreach { dm =>
        val ogSafe = og.positionalDim.isEmpty || TaskGraph.isLocalPlan(og.df)
        val otherSafe = other.groups.find(_.dims.contains(dm)).forall(g =>
          g.positionalDim.isEmpty || TaskGraph.isLocalPlan(g.df))
        if (ogSafe && otherSafe) {
          if (!TaskGraph.labelsCompatible(
              og.frame(needPositional = true).select(dm).distinct(),
              other.indices(dm)))
            throw new GraftException(
              s"""Conflicting index values for index name "$dm"""")
        } else if (TaskGraph.strictValidation(og.df))
          TaskGraph.requireSameLength(dm,
            og.frame(needPositional = true).select(dm).distinct(),
            other.indices(dm))
      }
      merged = merged.copy(groups = merged.groups
        .map(g => if (g eq og) g.copy(valueCols = g.valueCols - key) else g)
        .filter(_.valueCols.nonEmpty))
    }
    // Conversely, a value-mapped incoming sink supersedes any stale
    // reduce spec the key had on the base side.
    if (renamedGroups.exists(_.valueCols.contains(key)))
      merged = merged.copy(reduces = merged.reduces - key)
    renamedGroups.foreach { g =>
      var fresh = g.valueCols
      g.valueCols.foreach { case (n, _) =>
        if (merged.isMapped(n)) {
          val old = merged.groups(merged.mappedNode(n))
          if (old.dims.size != g.dims.size)
            throw new GraftException(s"Node '$n' has already been mapped")
          // metadata-scale guard, as in addGroup: eager equality only for
          // in-memory tables; file-backed re-maps take replace semantics
          val bothLocal =
            TaskGraph.isLocalPlan(old.df) && TaskGraph.isLocalPlan(g.df)
          val labelsMatch = !bothLocal ||
            old.dims.zip(g.dims).forall { case (od, nd) =>
              TaskGraph.sameData(old.labelFrame(od).toDF("l"), g.labelFrame(nd).toDF("l"))
            }
          if (!labelsMatch)
            throw new GraftException(
              s"Node '$n' has already been mapped with different indices")
          if (!bothLocal && TaskGraph.strictValidation(g.df))
            old.dims.zip(g.dims).foreach { case (od, nd) =>
              TaskGraph.requireSameLength(od,
                old.labelFrame(od), g.labelFrame(nd))
            }
          val valuesMatch = bothLocal && TaskGraph.sameData(
            old.df.select(col(old.valueCols(n)).as("v")),
            g.df.select(col(g.valueCols(n)).as("v")))
          if (valuesMatch) fresh -= n // identical: no-op
          else merged = merged.copy(groups = merged.groups // replace: incoming wins
            .map(og => if (og eq old) og.copy(valueCols = og.valueCols - n) else og)
            .filter(_.valueCols.nonEmpty))
          // (reference merge semantics, node_values_test.py:148-159:
          // re-adding an existing node with different values on identical
          // labels REPLACES the value, it does not raise)
        }
      }
      if (fresh.nonEmpty) {
        // shared-dim label consistency across graphs (node_values.py:79-90);
        // positional frames only built when free (see addGroup)
        def safeLabels(dg: DimGroup, dim: String): Option[DataFrame] =
          if (dg.positionalDim.isEmpty || TaskGraph.isLocalPlan(dg.df))
            Some(dg.frame(needPositional = true).select(dim).distinct())
          else None
        g.dims.foreach { dim =>
          merged.groups.filter(og => (og ne g) && og.dims.contains(dim)).foreach { og =>
            (safeLabels(og, dim), safeLabels(g, dim)) match {
              case (Some(a), Some(b)) if !TaskGraph.labelsCompatible(a, b) =>
                throw new GraftException(
                  s"""Conflicting index values for index name "$dim"""")
              case (Some(_), Some(_)) => ()
              case _ if TaskGraph.strictValidation(g.df) =>
                // at least one side is file-backed: strict length guard
                TaskGraph.requireSameLength(dim,
                  og.frame(needPositional = true).select(dim).distinct(),
                  g.frame(needPositional = true).select(dim).distinct())
              case _ => ()
            }
          }
        }
        merged = merged.copy(groups = merged.groups :+ g.copy(valueCols = fresh))
      }
    }
    // the key's OLD reduce spec dies unconditionally: the spliced graph's
    // sink is the key's new definition, whatever its kind — keeping a
    // stale spec would make frameOf (which consults reduces before DAG
    // preds) silently ignore the spliced branch when the incoming sink is
    // a plain derived node. renamedReduces re-adds the key when the
    // incoming sink IS a reduce.
    merged.copy(reduces = (merged.reduces - key) ++ renamedReduces
      .filter { case (n, spec) => composed.contains(n) && composed.contains(spec.pred) })
  }

  /** Rebuild catalog consistency after DAG surgery: drop value mappings and
    * reduce specs for nodes no longer present; drop empty groups.
    */
  private def prunedDag(d: Dag): TaskGraph = {
    val gs = groups
      .map(g => g.copy(valueCols = g.valueCols.filter { case (n, _) => d.contains(n) }))
      .filter(_.valueCols.nonEmpty)
    val rs = reduces.filter { case (n, spec) => d.contains(n) && d.contains(spec.pred) }
    TaskGraph(d, gs, rs)
  }

  // ------------------------------------------------------------- execution

  /** The expansion frame of a node: a lazy DataFrame with one label column
    * per dim of the node (named after the dim) plus the node's value column
    * (named after the node) — plus any co-grouped sibling columns that
    * arrive free. This replaces the reference's driver-side Cartesian clone
    * expansion (graph.py:367-424): the expansion is *declared* relationally
    * and Catalyst plans it, so it never materializes on the driver and
    * scales to arbitrarily large dims.
    *
    * Co-grouped predecessors are read from their shared `DimGroup` in one
    * scan (no self-joins on row identity); independent dims combine via
    * crossJoin (the reference's chained-map cross product,
    * graph_test.py:382-402); shared dims via equi-join on the dim label.
    */
  def result(node: String, needPositional: Boolean = false): DataFrame = {
    require(dag.contains(node), s"unknown node '$node'")
    val memo = scala.collection.mutable.Map.empty[(String, Boolean), DataFrame]
    frameOf(node, needPositional, memo)
  }

  /** Is `d` a positional dim whose labels are not yet materialized? */
  private def isPositionalDim(d: String): Boolean =
    groups.exists(g => g.dims.contains(d) && !g.labelCols.contains(d))

  private def frameOf(n: String, needPos: Boolean,
      memo: scala.collection.mutable.Map[(String, Boolean), DataFrame]): DataFrame =
    memo.getOrElseUpdate((n, needPos), {
      if (isMapped(n)) groups(mappedNode(n)).frame(needPos)
      else reduces.get(n) match {
        case Some(spec) => reduceFrame(n, spec, needPos, memo)
        case None =>
          val preds = dag.predecessors(n)
          if (preds.isEmpty) {
            val spark = groups.headOption.map(_.df.sparkSession)
              .getOrElse(SparkSession.active)
            spark.range(1).select(lit(null).cast("string").as(n))
          } else {
            val base = mergePredFrames(preds, needPos, memo)
            val attrs = dag.attrs.getOrElse(n, Map.empty)
            attrs.get("expr") match {
              case Some(e) => base.withColumn(n, expr(e))
              case None if preds.size == 1 && base.columns.contains(preds.head) =>
                base.withColumn(n, col(preds.head))
              case None =>
                base.withColumn(n, struct(preds.filter(base.columns.contains).map(col): _*))
            }
          }
      }
    })

  /** Join predecessor frames on their SHARED DIMS — the row identity. A
    * pred whose column is already present came along with a co-grouped
    * sibling (skip — no self-join); preds sharing dims equi-join
    * (null-safe) on the dim label columns; disjoint dims crossJoin (the
    * reference's chained-map cross product).
    *
    * Joining on dims, not on arbitrary shared columns, matches the
    * reference's strictly per-index expansion (graph.py:367-424): two
    * branches of a diamond (a->b, a->c, {b,c}->d) both carry ancestor
    * value column 'a', and joining on 'a' would cross-match duplicate
    * values (and silently drop nulls). Instead the duplicated ancestor
    * columns are dropped from the right side (identical by construction)
    * and the join keys on the dim labels alone; a positional dim shared by
    * two predecessors has its label column materialized to serve as the
    * key.
    */
  private def mergePredFrames(preds: Seq[String], needPos: Boolean,
      memo: scala.collection.mutable.Map[(String, Boolean), DataFrame]): DataFrame = {
    val occurrences = preds.flatMap(p => dimsOf(p).distinct)
    val sharedDims = occurrences.groupBy(identity).collect {
      case (d, occ) if occ.size > 1 => d
    }.toSet
    val mergeNeedPos = needPos || sharedDims.exists(isPositionalDim)
    var acc: DataFrame = null
    var accDims = Set.empty[String]
    preds.foreach { p =>
      if (acc == null) {
        acc = frameOf(p, mergeNeedPos, memo)
        accDims = dimsOf(p).toSet
      } else if (!acc.columns.contains(p)) {
        val f = frameOf(p, mergeNeedPos, memo)
        val joinDims = accDims.intersect(dimsOf(p).toSet).toSeq.sorted
        acc = dimJoin(acc, f, joinDims)
        accDims ++= dimsOf(p)
      }
    }
    acc
  }

  /** The reduce node's INPUT frame: the predecessor expansion, with the
    * groupby key column attached when not co-grouped. One row per
    * consumed pred copy — also the edge set of the fan-in (each input row
    * feeds exactly one output group).
    */
  private def reduceInput(n: String, spec: ReduceSpec, needPos: Boolean,
      memo: scala.collection.mutable.Map[(String, Boolean), DataFrame]): DataFrame = {
    // Positional dims that survive the reduce are observed as group keys:
    // their labels must be materialized in the predecessor frame.
    val needPredPos = needPos || dimsOf(n).exists(isPositionalDim)
    val predFrame0 = frameOf(spec.pred, needPredPos, memo)
    spec.groupKey match {
      case None => predFrame0
      case Some(k) =>
        // Group labels = values of key node k. The key column is already in
        // the frame when co-grouped (the common case): single-scan groupBy,
        // no join — a map-side-combinable hash aggregation, and the
        // positional labels stay UNmaterialized (this branch must not pay
        // zipWithIndex or lose the pruned parquet scan).
        if (predFrame0.columns.contains(k)) predFrame0
        else {
          // not co-grouped: the key attaches via a join on the shared
          // dims, whose label columns must exist on BOTH sides — only
          // here may positional materialization be forced
          val keyJoinDims = dimsOf(k).intersect(dimsOf(spec.pred))
          val joinNeedPos = needPredPos || keyJoinDims.exists(isPositionalDim)
          val predFrame = frameOf(spec.pred, joinNeedPos, memo)
          val kf = frameOf(k, joinNeedPos, memo)
          val joinDims = keyJoinDims
            .filter(d => predFrame.columns.contains(d) && kf.columns.contains(d))
          if (joinDims.nonEmpty) dimJoin(predFrame, kf, joinDims)
          else {
            val shared = predFrame.columns.intersect(kf.columns).toSeq
            require(shared.nonEmpty, s"groupby key '$k' shares no dim with '${spec.pred}'")
            predFrame.join(kf, shared)
          }
        }
    }
  }

  /** Null-safe equi-join on dim label columns: duplicated non-key columns
    * on the right are dropped first (identical ancestors by construction),
    * right-side keys are renamed to avoid self-join ambiguity, and a null
    * label aligns with itself. The one join discipline of the expansion
    * engine, shared by predecessor merging and key attachment.
    */
  private def dimJoin(left: DataFrame, right: DataFrame,
      joinDims: Seq[String]): DataFrame = {
    val dupCols = right.columns.filter(c =>
      left.columns.contains(c) && !joinDims.contains(c))
    val fd = right.drop(dupCols.toIndexedSeq: _*)
    if (joinDims.isEmpty) left.crossJoin(fd)
    else {
      val renamed = joinDims.foldLeft(fd)((d0, d) =>
        d0.withColumnRenamed(d, "__jk_" + d))
      val cond = joinDims.map(d => col(d) <=> col("__jk_" + d)).reduce(_ && _)
      left.join(renamed, cond).drop(joinDims.map("__jk_" + _).toIndexedSeq: _*)
    }
  }

  private def reduceFrame(n: String, spec: ReduceSpec, needPos: Boolean,
      memo: scala.collection.mutable.Map[(String, Boolean), DataFrame]): DataFrame = {
    val keptDims = dimsOf(n)
    val input = reduceInput(n, spec, needPos, memo)
    val attrs = dag.attrs.getOrElse(n, Map.empty)
    val aggExpr: Column = TaskGraph.aggFor(attrs, col(spec.pred)).as(n)
    if (keptDims.isEmpty) input.agg(aggExpr)
    else input.groupBy(keptDims.map(col): _*).agg(aggExpr)
  }

  /** Materialized task table: one row per node copy, with the node name,
    * its index labels (as strings) and its value (as string) — the parity
    * equivalent of the reference's `to_networkx()` (graph.py:367-424),
    * including the custom `value_attr` name (graph_test.py:1088-1104).
    * Tests/small graphs only: production consumers use `result(node)`.
    */
  def taskTable(valueAttr: String = "value"): DataFrame = {
    val frames = dag.topologicalOrder.map { n =>
      val f = result(n, needPositional = true)
      f.select(lit(n).as("node"), indexMapOf(dimsOf(n)).as("index"),
        col(n).cast("string").as(valueAttr))
    }
    frames.reduce(_.unionByName(_))
  }

  private def indexMapOf(dims: Vector[String]): Column =
    if (dims.isEmpty) expr("map()").cast("map<string,string>")
    else map_from_arrays(
      array(dims.map(lit(_)): _*),
      array(dims.map(d => col(d).cast("string")): _*))

  /** Materialized edge table: one row per edge between node COPIES — the
    * edge-set parity of the reference's `to_networkx()` (clone expansion
    * graph.py:595-611; groupby wiring `_make_groupby_graph`,
    * graph.py:426-441). For a regular edge the copies align on their
    * shared dims (the child frame carries the parent's dim labels); for a
    * fan-in edge each consumed pred copy connects to the group it lands
    * in (kept dims + its own group-key value); a groupby key node's copy
    * connects to the reduce copy labeled with its value. Tests/small
    * graphs only, like taskTable.
    */
  def edgeTable(): DataFrame = {
    if (dag.edgeList.isEmpty) {
      val spark = groups.headOption.map(_.df.sparkSession).getOrElse(SparkSession.active)
      return spark.emptyDataFrame
        .select(lit("").as("src"), expr("map()").cast("map<string,string>").as("src_index"),
          lit("").as("dst"), expr("map()").cast("map<string,string>").as("dst_index"))
    }
    val memo = scala.collection.mutable.Map.empty[(String, Boolean), DataFrame]
    val frames = dag.edgeList.map { case (p, c) =>
      val frame = reduces.get(c) match {
        case Some(spec) => reduceInput(c, spec, needPos = true, memo)
        case None => frameOf(c, needPos = true, memo)
      }
      // dedupe on the scalar label columns (set ops reject MAP columns),
      // then assemble the index maps
      val labelCols = (dimsOf(p) ++ dimsOf(c)).distinct
      frame.select(labelCols.map(col): _*).distinct()
        .select(
          lit(p).as("src"), indexMapOf(dimsOf(p)).as("src_index"),
          lit(c).as("dst"), indexMapOf(dimsOf(c)).as("dst_index"))
    }
    frames.reduce(_.unionByName(_))
  }
}

/** Intermediate for `groupby(col).reduce(...)` (reference graph.py:540-592). */
final class GroupbyTaskGraph(g: TaskGraph, keyNode: String) {
  /** Fan-in per distinct value of the groupby column. The consumed dim is
    * the key column's own (first) dim; the new dim is named after the key
    * column and appended last (reference graph.py:555-556, 586-592;
    * axis-order rule groupby_test.py:771-824).
    */
  def reduce(key: String = null, name: String = null,
      attrs: Map[String, String] = Map.empty): TaskGraph = {
    val consumed = g.dimsOf(keyNode).headOption.getOrElse(
      throw new GraftException(s"groupby key '$keyNode' has no dims"))
    g.reduceImpl(key, Some(consumed), None, name, attrs, Some(keyNode))
  }
}

object TaskGraph {

  def posCol(dim: String): String = "__pos_" + dim

  /** Every leaf of the plan is an in-memory relation (driver-side data —
    * the reference's whole universe). Such frames may be collected,
    * window-ranked, and eagerly validated without scale concerns.
    */
  def isLocalPlan(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves()
      .forall(_.getClass.getSimpleName == "LocalRelation")

  /** Opt-in strict shape validation
    * (`spark.conf.set("spark.graft.strictValidation", "true")`): the
    * file-backed validation paths normally defer to join semantics so
    * graph CONSTRUCTION never runs a Spark job — the right default at
    * 100 TB, but it turns a dim-length mismatch (which the reference
    * raises on eagerly) into silent row drops at execution time. Strict
    * mode adds a cheap eager LENGTH guard on exactly those deferred
    * paths: colliding or re-mapped dims must have equal label counts or
    * the call raises. Costs one count() job per checked dim (plus the
    * positional zipWithIndex pass for positional file-backed dims).
    */
  def strictValidation(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.strictValidation")
      .exists(_.equalsIgnoreCase("true"))

  /** Strict-mode guard: two label sets claimed to describe the same dim
    * must at least AGREE IN LENGTH (full equality would be a fact-scale
    * join; length catches the shape mismatches that silently shrink
    * results through inner-join alignment).
    */
  private[core] def requireSameLength(dim: String, a: DataFrame, b: DataFrame): Unit = {
    val (ca, cb) = (a.count(), b.count())
    if (ca != cb)
      throw new GraftException(
        s"""Conflicting index lengths for index name "$dim" ($ca vs $cb)""")
  }

  /** Unit-carrying coordinate encoding (reference ScippDataArrayAdapter:
    * a coord with a unit yields `(value, unit)` tuple labels,
    * value_array_adapters.py:241-250). The label becomes a
    * `struct(value, unit)` column with the unit also recorded in the
    * column Metadata; `sel`/`loc` with a `(value, unit)` pair then match
    * value AND unit — a lookup in the wrong unit matches nothing.
    */
  def unitCoord(value: Column, unit: String): Column =
    struct(value.as("value"), lit(unit).as("unit")).as("coord",
      new org.apache.spark.sql.types.MetadataBuilder()
        .putString("unit", unit).build())

  /** Graph from a bare DAG shape (reference `Graph.__init__`). */
  def apply(dag: Dag): TaskGraph = TaskGraph(dag, Vector.empty, Map.empty)

  /** Linear chain helper (`a -> b -> c`). */
  def chain(names: String*): TaskGraph = TaskGraph(Dag.chain(names: _*))

  def fromEdges(edges: (String, String)*): TaskGraph =
    TaskGraph(Dag.fromEdges(edges: _*))

  /** Aggregate for a reduce node from its attrs (the executable engine
    * surface; reference nodes carry `attrs={'func': ...}` for an external
    * executor, graph_test.py:405-415). Default: order-stable structural
    * collect for reference fan-in parity. `sum_exact`/`avg_exact` sum via
    * decimal for order-independent floating-point results.
    */
  def aggFor(attrs: Map[String, String], c: Column): Column =
    attrs.getOrElse("func", "collect") match {
      case "sum" => sum(c)
      case "sum_exact" => sum(c.cast("decimal(27,6)")).cast("double")
      case "min" => min(c)
      case "max" => max(c)
      case "count" => count(c)
      case "avg" | "mean" => avg(c)
      case "avg_exact" => (sum(c.cast("decimal(27,6)")) / count(c)).cast("double")
      case "collect_set" => sort_array(collect_set(c))
      case "collect" | "collect_list" => sort_array(collect_list(c))
      case other => call_function(other, c)
    }

  /** Semantic data equality for re-map validation: plan-level `sameResult`
    * first (free), then a bounded collect compare. Parameter tables are
    * metadata-scale; this is never applied to fact-scale data.
    */
  def sameData(a: DataFrame, b: DataFrame, maxRows: Int = 100000): Boolean = {
    if (a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)) return true
    if (a.schema.fields.map(_.dataType).toSeq != b.schema.fields.map(_.dataType).toSeq)
      return false
    val aRows = a.limit(maxRows + 1).collect()
    if (aRows.length > maxRows)
      throw new GraftException("parameter table too large for value-equality validation")
    val bRows = b.limit(maxRows + 1).collect()
    aRows.map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted.toSeq ==
      bRows.map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted.toSeq
  }

  /** Best-effort bounded equality for SHARED-DIM label validation. The
    * reference validates index values eagerly in memory
    * (node_values.py:79-90); at 100 TB an eager distinct-and-compare of a
    * fact-scale dim would be a full Spark job at graph-BUILD time, so
    * label sets beyond the bound pass validation and any misalignment
    * surfaces as the relational semantics of the dim join (mismatched
    * labels drop, as in an inner join). Metadata-scale dims — the
    * reference's whole universe — still get the eager reference-parity
    * error.
    */
  def labelsCompatible(a: DataFrame, b: DataFrame, maxRows: Int = 100000): Boolean = {
    if (a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)) return true
    // Eager validation only when every leaf is an in-memory relation (the
    // reference's whole universe is driver-side arrays). A file-backed dim
    // is fact-scale: collecting it at graph-build time is the wrong cost
    // model, so validation defers to the dim join's relational semantics.
    def metadataScale(df: DataFrame): Boolean =
      df.queryExecution.analyzed.collectLeaves().forall { leaf =>
        val n = leaf.getClass.getSimpleName
        n == "LocalRelation" || n == "OneRowRelation" || n == "Range"
      }
    if (!metadataScale(a) || !metadataScale(b)) return true
    try sameData(a, b, maxRows)
    catch { case _: GraftException => true }
  }

  def sparkTypeOf(s: Seq[Any]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    s.headOption match {
      case Some(_: Int) => IntegerType
      case Some(_: Long) => LongType
      case Some(_: Double) => DoubleType
      case Some(_: String) => StringType
      case Some(_: Boolean) => BooleanType
      // a nested sequence under the SEQUENCE adapter is a value, not an
      // extra dim (reference graph_test.py:132-139)
      case Some(inner: Seq[_]) => ArrayType(sparkTypeOf(inner.asInstanceOf[Seq[Any]]))
      case _ => StringType
    }
  }
}
