package graft.tools

/** Dev harness: print Types.promoteNamed over the full 11×11 dtype
  * grid as JSON for the numpy cross-check (tools/check_promote.py).
  */
object PromoteDump {
  def main(args: Array[String]): Unit = {
    val names = Seq("bool", "int8", "int16", "int32", "int64",
      "uint8", "uint16", "uint32", "uint64", "float32", "float64")
    val rows = for (a <- names; b <- names)
      yield s"""["$a","$b","${graft.Types.promoteNamed(a, b)}"]"""
    println(rows.mkString("[", ",", "]"))
  }
}
