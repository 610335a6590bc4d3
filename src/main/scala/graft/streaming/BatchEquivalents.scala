package graft.streaming

import graft.Op

object BatchEquivalents {
  val ops: Seq[Op] = Seq()
}
