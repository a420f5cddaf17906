package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Arbitrary node keys over the String-keyed engine — the sciline-style
  * typed consumer the reference supports by keying graph nodes with
  * Python TYPES (`/root/reference/tests/graph_test.py:237-258`:
  * `g.add_edge(int, 'a')`, a params DataFrame whose COLUMN NAMES are
  * types, and readback addressed by those same type objects).
  *
  * Scala's analogue of "any hashable object" is any `K` with an
  * INJECTIVE string render: the engine stays String-keyed (the
  * documented representation trade — dim/index machinery, oracle SQL,
  * and the `cb_*` gate rows all speak strings), and this façade carries
  * the codec so a typed caller constructs, maps, reduces, branch-selects
  * and reads back by its own keys without ever seeing the encoding. Two
  * codecs cover the reference's cases:
  *
  *  - [[TypedGraph.anyKey]]: kind-tagged render over mixed keys —
  *    `Class[_]` (sciline's type keys), `String`, and any other value
  *    via its class + toString (injective whenever distinct keys render
  *    distinctly, the same contract Python hashing puts on `__eq__`).
  *    `TypedGraph.anyKeys(edges)` mirrors `add_edge(int, 'a')` exactly.
  *  - a caller-supplied `K => String` for homogeneous typed keys
  *    (e.g. a case class `Key(stream: String, run: Int)`).
  *
  * Only key-addressed operations live here; dim-addressed operations
  * (slicing, `sel`/`loc`) and whole-graph outputs pass through `graph`
  * unchanged — dims were never node keys in the reference either.
  *
  * Node ATTRS are typed-addressable too ([[withAttrs]]/[[attr]]): attr
  * keys and values route through the same injective render into the
  * engine's stringly store, so the reference's attrs-preservation rules
  * (map/getItem/setItem, graph_test.py:1041-1104) apply unchanged.
  * Values read back rendered, not as live objects — the engine stores
  * replayable strings, never closures (the documented
  * executable-metadata trade; reference attrs may carry user functions,
  * graph.py:285,311).
  */
final case class TypedGraph[K](graph: TaskGraph, codec: K => String) {

  private def e(k: K): String = codec(k)

  /** The engine-side name of `k` — for addressing `taskTable` /
    * `edgeTable` rows, whose `node` column carries encoded names. */
  def nodeName(k: K): String = e(k)

  def mapSeqs(values: Map[K, Seq[Any]])(
      implicit spark: SparkSession): TypedGraph[K] =
    copy(graph = graph.mapSeqs(values.map { case (k, v) => e(k) -> v }))

  def mapNestedSeqs(values: Map[K, Seq[Any]])(
      implicit spark: SparkSession): TypedGraph[K] =
    copy(graph = graph.mapNestedSeqs(values.map { case (k, v) => e(k) -> v }))

  /** Map a params frame whose COLUMNS stand for typed keys (the
    * reference's "DataFrame with type as column name"): `cols` binds
    * each key to its column, routed through the engine's node->column
    * mapping so the frame itself is untouched. */
  def mapFrameKeyed(df: DataFrame, cols: Map[K, String]): TypedGraph[K] =
    copy(graph = graph.mapFrame(df,
      nodes = cols.map { case (k, c) => e(k) -> c }))

  /** `key`/`name` are Options ON PURPOSE: a `null.asInstanceOf[K]`
    * default unboxes to 0 for a primitive `K` (TypedGraph[Int]), turning
    * a reduce-all into a reduce of node "0" — `None` has no such trap. */
  def reduce(key: Option[K] = None, index: String = null,
      axis: Integer = null, name: Option[K] = None,
      attrs: Map[String, String] = Map.empty): TypedGraph[K] =
    copy(graph = graph.reduce(
      key.map(e).orNull, index, axis, name.map(e).orNull, attrs))

  def getItem(key: K): TypedGraph[K] = copy(graph = graph.getItem(e(key)))
  def delItem(key: K): TypedGraph[K] = copy(graph = graph.delItem(e(key)))
  def setItem(key: K, other: TypedGraph[K]): TypedGraph[K] =
    copy(graph = graph.setItem(e(key), other.graph))

  def result(key: K, needPositional: Boolean = false): DataFrame =
    graph.result(e(key), needPositional)
  def dimsOf(key: K): Vector[String] = graph.dimsOf(e(key))
  def isMapped(key: K): Boolean = graph.isMapped(e(key))

  /** Merge opaque TYPED attrs onto an existing node (the reference's
    * `g.nodes[key]['attr'] = value`, graph_test.py:1041-1104): attr keys
    * AND values route through an injective render (default
    * [[TypedGraph.anyKey]]) into the engine's stringly attr store, so
    * they survive map/getItem/setItem/groupby exactly as engine attrs do
    * and merge/conflict under the engine's own rules. Values read back
    * RENDERED ([[attr]]/[[attrsOf]]) — the documented executable-metadata
    * trade: the engine stores replayable strings, not closures. */
  def withAttrs(node: K, attrs: Map[Any, Any],
      render: Any => String = TypedGraph.anyKey): TypedGraph[K] =
    copy(graph = graph.withAttrs(e(node),
      attrs.map { case (a, v) => render(a) -> render(v) }))

  /** A node's attr addressed by TYPED key; the value comes back in its
    * rendered form. */
  def attr(node: K, attrKey: Any,
      render: Any => String = TypedGraph.anyKey): Option[String] =
    attrsOf(node).get(render(attrKey))

  /** All engine-side (rendered) attrs of a node. */
  def attrsOf(node: K): Map[String, String] =
    graph.dag.attrs.getOrElse(e(node), Map.empty)

  def taskTable(valueAttr: String = "value"): DataFrame =
    graph.taskTable(valueAttr)
  def edgeTable(): DataFrame = graph.edgeTable()

  /** Typed groupby: fan-in per distinct value of the key node's column
    * (the engine's GroupbyTaskGraph, with both the groupby key and the
    * reduce target addressed by caller keys). */
  def groupby(keyNode: K): TypedGroupbyGraph[K] =
    new TypedGroupbyGraph(graph.groupby(e(keyNode)), codec)
}

final class TypedGroupbyGraph[K](g: GroupbyTaskGraph, codec: K => String) {
  /** Option defaults for the same primitive-K reason as
    * [[TypedGraph.reduce]]. */
  def reduce(key: Option[K] = None, name: Option[K] = None,
      attrs: Map[String, String] = Map.empty): TypedGraph[K] =
    TypedGraph(g.reduce(
      key.map(codec).orNull, name.map(codec).orNull, attrs), codec)
}

object TypedGraph {

  /** Kind-tagged injective render over mixed keys. `Class[_]` renders by
    * its JVM name (sciline's type keys), `String` by itself; anything
    * else by class + toString — injective exactly when distinct keys
    * render distinctly, which is the same burden Python's hash/eq
    * contract puts on reference node keys. Tags keep the kinds from
    * colliding (the STRING "cls:int" and the CLASS named "int" differ).
    */
  val anyKey: Any => String = {
    case c: Class[_] => "cls:" + c.getName
    case s: String => "str:" + s
    case other => "obj:" + other.getClass.getName + ":" + other.toString
  }

  /** `add_edge(int, 'a')`-style construction with mixed key kinds. */
  def anyKeys(edges: (Any, Any)*): TypedGraph[Any] =
    fromEdges(anyKey)(edges: _*)

  def fromEdges[K](codec: K => String)(edges: (K, K)*): TypedGraph[K] =
    TypedGraph(TaskGraph.fromEdges(
      edges.map { case (a, b) => codec(a) -> codec(b) }: _*), codec)
}
