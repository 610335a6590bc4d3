package graft.operators

import graft.Op

object Similarity {
  val ops: Seq[Op] = Seq()
}
