package graft.core

/** Column-name constants shared across the engine.
  *
  * Mirrors the naming conventions of the reference
  * (pyspark_graph/graph.py:7-17, algorithms/pregel.py:22-24,
  * algorithms/connected_components.py:10, algorithms/label_propagation.py:10).
  */
object Columns {
  // graph schema
  val ID = "id"
  val SRC = "src"
  val DST = "dst"
  val EDGE_ID = "edge_id"
  val ADJ = "adjacent"
  val OLD_ID = "old_id"
  val OLD_SRC = "old_src"
  val OLD_DST = "old_dst"
  val DEGREE = "degree"
  val IN_DEGREE = "in_degree"
  val OUT_DEGREE = "out_degree"

  // pregel / algorithm outputs
  val MSG = "message"
  val STATE = "state"
  val OLD_STATE = "old_state"
  val COMPONENT = "component"
  val LABEL = "label"
  val COMMUNITY = "community"

  // bfs
  val START = "start"
  val END = "end"
  val EDGES = "edges"
  val VERTICES = "vertices"

  // coo matrix
  val ROW = "row"
  val COL = "col"
  val VAL = "val"
}
