package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's type-keyed graph tests over the TypedGraph
  * façade — the sciline consumer shape where node keys are TYPES, not
  * strings (tests/graph_test.py:237-258), closing the long-standing
  * "arbitrary hashable node names" representation gap at the API level.
  */
class TypedGraphSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestSession.get

  test("type-as-node-key: add_edge(int, 'a') / add_edge(float, 'a') maps " +
      "a type-keyed params frame and cross-multiplies — graph_test.py:237-258") {
    import spark.implicits._
    // raw_params = {int: [1,2,3], float: [0.1,0.2,0.3]} as a frame whose
    // columns STAND FOR types, bound through mapFrameKeyed
    val params = Seq((1, 0.1), (2, 0.2), (3, 0.3)).toDF("ints", "floats")
    val g = TypedGraph.anyKeys(
        (classOf[Int], "a"), (classOf[Double], "a"))
      .mapFrameKeyed(params, Map[Any, String](
        classOf[Int] -> "ints", classOf[Double] -> "floats"))
    // int and float map JOINTLY (one call, one frame) -> zipped dim of 3,
    // exactly the reference's 3-element mapped graph per source; the
    // reference's `len(result.nodes) == 3 * 3` counts int/float/a tasks
    assert(g.dimsOf(classOf[Int]) == Vector("dim_0"))
    assert(g.dimsOf(classOf[Double]) == Vector("dim_0"))
    assert(g.result(classOf[Int]).count() == 3)
    assert(g.result("a").count() == 3)
    val taskCount = g.taskTable().count()
    assert(taskCount == 9, s"expected 3 tasks per node x 3 nodes, got $taskCount")
    // readback addressed BY TYPE: result.nodes[idx(int, i)] == {'value': i+1}
    val intCol = g.nodeName(classOf[Int])
    val ints = g.result(classOf[Int]).orderBy(intCol)
      .collect().map(_.getAs[Int](intCol)).toSeq
    assert(ints == Seq(1, 2, 3))
    val dblCol = g.nodeName(classOf[Double])
    val floats = g.result(classOf[Double]).orderBy(dblCol)
      .collect().map(_.getAs[Double](dblCol)).toSeq
    assert(floats == Seq(0.1, 0.2, 0.3))
  }

  test("mixed key kinds never collide, and typed reduce/getItem/delItem " +
      "address the right nodes") {
    import spark.implicits._
    // a STRING key that renders like a class name must stay distinct
    assert(TypedGraph.anyKey("cls:int") != TypedGraph.anyKey(classOf[Int]))
    case class Key(stream: String, run: Int)
    assert(TypedGraph.anyKey(Key("a", 1)) != TypedGraph.anyKey(Key("a", 2)))

    // reduce the TYPE-keyed mapped source itself (fan-in over its dim)
    val g = TypedGraph.anyKeys((classOf[Int], "out"))
      .mapSeqs(Map[Any, Seq[Any]](classOf[Int] -> Seq(1, 2, 3)))
      .reduce(key = Some(classOf[Int]), name = Some("total"),
        attrs = Map("func" -> "sum"))
    val totalCol = g.nodeName("total")
    assert(g.result("total").collect()
      .map(_.getAs[Long](totalCol)).toSeq == Seq(6L))
    // branch select by typed key keeps the branch; delete leaves the key
    // as a BARE INPUT (reference graph.py:463-478): definition gone,
    // incoming edges gone, node still present
    val branch = g.getItem(classOf[Int])
    assert(branch.graph.dag.nodeList.contains(branch.nodeName(classOf[Int])))
    val dropped = g.delItem("total")
    val totalName = dropped.nodeName("total")
    assert(dropped.graph.dag.nodeList.contains(totalName))
    assert(!dropped.graph.reduces.contains(totalName),
      "deleted key kept its reduce definition")
    assert(!dropped.graph.dag.edgeList.exists(_._2 == totalName),
      "deleted key kept incoming edges")
  }

  test("typed groupby: fan-in per distinct key-column value addressed " +
      "by typed keys end to end") {
    import org.apache.spark.sql.functions.col
    val g = TypedGraph.anyKeys((classOf[Int], "out"), ("label", "out"))
      .mapSeqs(Map[Any, Seq[Any]](classOf[Int] -> Seq(1, 2, 3, 4),
        "label" -> Seq("x", "y", "x", "y")))
      .groupby("label")
      .reduce(key = Some(classOf[Int]), name = Some("per_label"),
        attrs = Map("func" -> "sum"))
    // the groupby dim is named after the ENGINE-side key node name
    val out = g.result("per_label")
      .select(col(g.nodeName("label")), col(g.nodeName("per_label")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 4L, "y" -> 6L))
  }

  test("typed attrs survive map / getItem / setItem, addressed by typed " +
      "keys with typed attr keys — graph_test.py:1041-1104") {
    import spark.implicits._
    val render = TypedGraph.anyKey
    // chain a -> b -> c with TYPE node keys and TYPED attr keys (an Int
    // attr key shows the injective render at work on non-string keys)
    val a = classOf[Int]; val b = classOf[Double]; val c = classOf[String]
    val g = TypedGraph.anyKeys((a, b), (b, c))
      .withAttrs(a, Map("attr1" -> 1))
      .withAttrs(b, Map("attr2" -> 2))
      .withAttrs(c, Map(3 -> "attr3"))
    // preserved through map (graph_test.py:1088-1104)
    val mapped = g.mapSeqs(Map[Any, Seq[Any]](a -> Seq(1, 2, 3)))
    assert(mapped.attr(a, "attr1").contains(render(1)))
    // preserved through branch select (graph_test.py:1051-1062): the
    // c-branch keeps upstream attrs, addressed by typed keys throughout
    val branch = mapped.getItem(c)
    assert(branch.attr(a, "attr1").contains(render(1)))
    assert(branch.attr(b, "attr2").contains(render(2)))
    assert(branch.attr(c, 3).contains(render("attr3")))
    // splice (graph_test.py:1065-1085, exact shape: a and b are PARALLEL
    // parents of c, so replacing the b branch leaves a intact): b swaps
    // in the OTHER graph's attrs and brings x's attrs along; a and c
    // keep theirs
    val x = classOf[Long]
    val gPar = TypedGraph.anyKeys((a, c), (b, c))
      .withAttrs(a, Map("attr1" -> 1))
      .withAttrs(b, Map("attr2" -> 2))
      .withAttrs(c, Map(3 -> "attr3"))
    val other = TypedGraph.anyKeys((x, b))
      .withAttrs(x, Map("attr4" -> 4))
      .withAttrs(b, Map("attr5" -> 5))
    val spliced = gPar.setItem(b, other)
    assert(spliced.attr(a, "attr1").contains(render(1)))
    assert(spliced.attrsOf(b) == Map(render("attr5") -> render(5)),
      "b was replaced: only the new graph's attrs may survive")
    assert(spliced.attr(c, 3).contains(render("attr3")))
    assert(spliced.attr(x, "attr4").contains(render(4)))
    // withAttrs refuses unknown nodes (no silent node creation)
    intercept[IllegalArgumentException] {
      g.withAttrs(classOf[Float], Map("oops" -> 0))
    }
  }

  test("reduce-all over a PRIMITIVE-keyed graph: the None default cannot " +
      "unbox to node 0") {
    import spark.implicits._
    // TypedGraph[Int]: node keys ARE primitive ints — the old
    // null.asInstanceOf[K] default would have read as key = Some(0)
    val g = TypedGraph.fromEdges((k: Int) => s"n$k")((0, 1))
      .mapSeqs(Map(0 -> Seq(10, 20, 30)))
      .reduce(attrs = Map("func" -> "sum"))
    // reduce-all reduced the SINK (node 1), not node 0
    val preds = g.graph.reduces.values.map(_.pred).toSet
    assert(preds == Set("n1"),
      s"reduce-all did not target the sink: reduced preds $preds")
  }

  test("homogeneous custom-codec keys: case-class keyed chain") {
    import spark.implicits._
    case class Key(stream: String, run: Int)
    val codec = (k: Key) => s"${k.stream}#${k.run}"
    val g = TypedGraph.fromEdges(codec)(
        (Key("raw", 1), Key("clean", 1)))
      .mapSeqs(Map(Key("raw", 1) -> Seq(5, 6)))
    assert(g.dimsOf(Key("clean", 1)) == Vector("dim_0"))
    assert(g.result(Key("clean", 1)).count() == 2)
  }
}
