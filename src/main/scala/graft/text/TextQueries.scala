package graft.text

import graft.QueryDef

object TextQueries {
  val defs: Seq[QueryDef] = Seq()
}
