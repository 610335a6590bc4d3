package graft.operators

import graft.Op

object Dedup {
  val ops: Seq[Op] = Seq()
}
