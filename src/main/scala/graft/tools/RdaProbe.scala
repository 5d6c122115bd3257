package graft.tools
import graft.sources.RData
import graft.sources.RData._
object RdaProbe {
  def describe(o: RObj, indent: String = "", depth: Int = 0): String = o match {
    case RNull => s"${indent}NULL"
    case RSym(n) => s"${indent}sym:$n"
    case RList(vs, attr) =>
      val hdr = s"${indent}list(${vs.length}) attrs=${attr.keys.mkString(",")}"
      if (depth > 3) hdr
      else hdr + "\n" + vs.take(6).map(describe(_, indent + "  ", depth + 1)).mkString("\n")
    case RPairList(vs, _) => s"${indent}pairlist(${vs.map(_._1).mkString(",")})"
    case RStrings(vs, attr) => s"${indent}str(${vs.length}) attrs=${attr.keys.mkString(",")} head=${vs.take(3).mkString("|")}"
    case RInts(vs, attr) => s"${indent}int(${vs.length}) attrs=${attr.keys.mkString(",")} head=${vs.take(5).mkString(",")}"
    case RReals(vs, attr) => s"${indent}real(${vs.length}) attrs=${attr.keys.mkString(",")} head=${vs.take(3).mkString(",")}"
    case RLogicals(vs, _) => s"${indent}lgl(${vs.length})"
    case RS4(attr) => s"${indent}S4 slots=${attr.keys.mkString(",")}" + "\n" +
      attr.take(8).map { case (k, v) => s"$indent  $k -> " + describe(v, "", depth + 1).linesIterator.next() }.mkString("\n")
  }
  def main(args: Array[String]): Unit = {
    for (f <- args.toSeq) {
      println(s"== $f")
      val m = RData.readFile(f)
      m.foreach { case (k, v) => println(s"binding: $k"); println(describe(v, "  ")) }
    }
  }
}
