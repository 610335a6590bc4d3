package graft.operators

import graft.Op

object Multimodal {
  val ops: Seq[Op] = Seq()
}
