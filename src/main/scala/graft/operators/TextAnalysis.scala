package graft.operators

import graft.Op

object TextAnalysis {
  val ops: Seq[Op] = Seq()
}
