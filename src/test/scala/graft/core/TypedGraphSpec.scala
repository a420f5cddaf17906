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
      .reduce(key = classOf[Int], name = "total",
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
      .reduce(key = classOf[Int], name = "per_label",
        attrs = Map("func" -> "sum"))
    // the groupby dim is named after the ENGINE-side key node name
    val out = g.result("per_label")
      .select(col(g.nodeName("label")), col(g.nodeName("per_label")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 4L, "y" -> 6L))
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
