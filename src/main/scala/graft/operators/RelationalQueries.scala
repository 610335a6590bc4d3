package graft.operators

import graft.Op

object RelationalQueries {
  val ops: Seq[Op] = Seq()
}
