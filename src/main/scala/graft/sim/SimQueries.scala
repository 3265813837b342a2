package graft.sim

import graft.QueryDef

object SimQueries {
  val defs: Seq[QueryDef] = Seq()
}
