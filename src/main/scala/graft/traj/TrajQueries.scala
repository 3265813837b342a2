package graft.traj

import graft.QueryDef

object TrajQueries {
  val defs: Seq[QueryDef] = Seq()
}
