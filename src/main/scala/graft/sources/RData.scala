package graft.sources

import java.io.{BufferedInputStream, DataInputStream, FileInputStream, InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal reader for R's serialization format (RDX2 / XDR, version 2) —
  * enough to load the reference's bundled fixtures
  * (`/root/reference/data/cell_lines.rda`, `cell_lines_small.RData`;
  * documented in /root/reference/R/data.R:1-14) without an R runtime.
  *
  * Format: R Internals, "Serialization Formats" (public). Supports the
  * subset data files use: NULL, symbols, pairlists, generic/character/
  * integer/real/logical vectors, attributes, back-references, and the
  * common ALTREP forms (compact integer/real sequences, wrappers).
  * bzip2 (via commons-compress, already on Spark's classpath) and gzip
  * containers are auto-detected.
  */
object RData {

  sealed trait RObj { def attr: Map[String, RObj] }
  case object RNull extends RObj { val attr: Map[String, RObj] = Map.empty }
  final case class RSym(name: String) extends RObj { val attr: Map[String, RObj] = Map.empty }
  final case class RList(values: Vector[RObj], attr: Map[String, RObj]) extends RObj
  final case class RPairList(values: Vector[(String, RObj)], attr: Map[String, RObj]) extends RObj
  final case class RStrings(values: Vector[String], attr: Map[String, RObj]) extends RObj
  final case class RInts(values: Vector[Int], attr: Map[String, RObj]) extends RObj
  final case class RReals(values: Vector[Double], attr: Map[String, RObj]) extends RObj
  final case class RLogicals(values: Vector[Boolean], attr: Map[String, RObj]) extends RObj
  /** An S4 object: only its slots (serialized as attributes) are kept. */
  final case class RS4(attr: Map[String, RObj]) extends RObj

  /** Top-level bindings of a .rda/.RData file (name -> object). */
  def readFile(path: String): Map[String, RObj] = {
    val raw = new BufferedInputStream(new FileInputStream(path))
    raw.mark(8)
    val magic = new Array[Byte](2)
    val got = raw.read(magic)
    raw.reset()
    val decompressed: InputStream =
      if (got == 2 && magic(0) == 'B' && magic(1) == 'Z')
        new BZip2CompressorInputStream(raw)
      else if (got == 2 && (magic(0) & 0xff) == 0x1f && (magic(1) & 0xff) == 0x8b)
        new GZIPInputStream(raw)
      else raw
    val in = new DataInputStream(new BufferedInputStream(decompressed))
    try {
      val hdr = new Array[Byte](5)
      in.readFully(hdr)
      val hs = new String(hdr, "US-ASCII")
      require(hs == "RDX2\n" || hs == "RDX3\n", s"not an RDX2/RDX3 file: $path")
      val fmt = new Array[Byte](2)
      in.readFully(fmt)
      require(fmt(0) == 'X', s"only XDR serialization supported, got '${fmt(0).toChar}'")
      val version = in.readInt()
      in.readInt() // writer version
      in.readInt() // min reader version
      require(version == 2 || version == 3,
        s"RDA serialization version $version unsupported (need 2 or 3)")
      if (version == 3) {
        // v3 header carries the writer's native encoding string
        val n = in.readInt()
        in.skipBytes(n)
      }
      new Parser(in).read() match {
        case RPairList(vs, _) => vs.toMap
        case other            => Map("value" -> other)
      }
    } finally in.close()
  }

  // SEXP type tags (R Internals / Rinternals.h — public constants)
  private val NILSXP = 0
  private val SYMSXP = 1
  private val LISTSXP = 2
  private val CHARSXP = 9
  private val LGLSXP = 10
  private val INTSXP = 13
  private val REALSXP = 14
  private val STRSXP = 16
  private val VECSXP = 19
  private val EXTPTRSXP = 22
  private val S4SXP = 25
  private val ALTREP = 238
  private val NILVALUE = 254
  private val REFSXP = 255

  private final class Parser(in: DataInputStream) {
    private val refs = ArrayBuffer.empty[RObj]

    private def readLength(): Int = {
      val n = in.readInt()
      require(n >= 0, "long vectors (>2^31) not supported")
      n
    }

    private def pairListToAttr(o: RObj): Map[String, RObj] = o match {
      case RPairList(vs, _) => vs.toMap
      case _                => Map.empty
    }

    def read(): RObj = {
      val flags = in.readInt()
      val ty = flags & 0xff
      val hasAttr = (flags & 0x200) != 0
      val hasTag = (flags & 0x400) != 0

      ty match {
        case NILSXP | NILVALUE => RNull

        case REFSXP =>
          val idx = {
            val i = flags >>> 8
            if (i == 0) in.readInt() else i
          }
          refs(idx - 1) // 1-based

        case SYMSXP =>
          val name = read() match {
            case RStrings(Vector(s), _) => s
            case other                  => throw new IllegalStateException(s"symbol name: $other")
          }
          val sym = RSym(name)
          refs += sym // symbols enter the reference table
          sym

        case LISTSXP =>
          // pairlist: per node, attributes come BEFORE tag/car
          val out = Vector.newBuilder[(String, RObj)]
          var nodeFlags = flags
          var done = false
          var firstAttr = Map.empty[String, RObj]
          while (!done) {
            val nAttr = (nodeFlags & 0x200) != 0
            val nTag = (nodeFlags & 0x400) != 0
            val attrs = if (nAttr) pairListToAttr(read()) else Map.empty[String, RObj]
            if (out.knownSize == 0) firstAttr = attrs
            val tag = if (nTag) read() match {
              case RSym(n) => n
              case other   => other.toString
            } else ""
            val car = read()
            out += ((tag, car))
            val next = in.readInt()
            (next & 0xff) match {
              case LISTSXP => nodeFlags = next
              case NILSXP | NILVALUE => done = true
              case other => throw new IllegalStateException(s"pairlist cdr of type $other")
            }
          }
          RPairList(out.result(), firstAttr)

        case CHARSXP =>
          val n = in.readInt()
          if (n < 0) RStrings(Vector(null), Map.empty) // NA_character_
          else {
            // encoding lives in the levels bits (flags >> 12): 0x04 =
            // LATIN1 ("R Internals" §1.8). Decoding those bytes as UTF-8
            // would silently mojibake — fail loudly instead.
            if (((flags >> 12) & 0x04) != 0)
              throw new IllegalStateException(
                "CHARSXP with LATIN1 encoding flag: unsupported, re-save as UTF-8")
            val b = new Array[Byte](n)
            in.readFully(b)
            RStrings(Vector(new String(b, "UTF-8")), Map.empty)
          }

        case LGLSXP =>
          val n = readLength()
          val vs = Vector.fill(n) {
            val v = in.readInt()
            // R serializes logical NA as Int.MinValue; `!= 0` would load
            // it as TRUE — fail loudly instead of corrupting the vector
            if (v == Int.MinValue)
              throw new IllegalStateException("NA in logical vector: unsupported")
            v != 0
          }
          RLogicals(vs, if (hasAttr) pairListToAttr(read()) else Map.empty)

        case INTSXP =>
          val n = readLength()
          val vs = Vector.fill(n)(in.readInt())
          RInts(vs, if (hasAttr) pairListToAttr(read()) else Map.empty)

        case REALSXP =>
          val n = readLength()
          val vs = Vector.fill(n)(in.readDouble())
          RReals(vs, if (hasAttr) pairListToAttr(read()) else Map.empty)

        case STRSXP =>
          val n = readLength()
          val vs = Vector.fill(n)(read() match {
            case RStrings(Vector(s), _) => s
            case other                  => throw new IllegalStateException(s"STRSXP elem: $other")
          })
          RStrings(vs, if (hasAttr) pairListToAttr(read()) else Map.empty)

        case VECSXP =>
          val n = readLength()
          val vs = Vector.fill(n)(read())
          RList(vs, if (hasAttr) pairListToAttr(read()) else Map.empty)

        case S4SXP =>
          // S4 object: the slots ARE the attribute pairlist (e.g. Matrix's
          // dgCMatrix with i/p/x/Dim/Dimnames)
          RS4(if (hasAttr) pairListToAttr(read()) else Map.empty)

        case EXTPTRSXP =>
          // data.table's `.internal.selfref` attribute: enters the ref
          // table, then (protected, tag) follow; the pointer itself is
          // meaningless outside R
          refs += RNull
          read() // protected
          read() // tag
          RNull

        case ALTREP =>
          val info = read() // pairlist: class symbol, package symbol, type
          val state = read()
          read() // attributes (reconstructed forms below don't need them)
          val className = info match {
            case RPairList(vs, _) =>
              vs.headOption.map(_._2) match {
                case Some(RSym(n)) => n
                case _             => ""
              }
            case _ => ""
          }
          (className, state) match {
            case ("compact_intseq", RReals(Vector(n, start, step), _)) =>
              RInts(Vector.tabulate(n.toInt)(i => (start + i * step).toInt), Map.empty)
            case ("compact_realseq", RReals(Vector(n, start, step), _)) =>
              RReals(Vector.tabulate(n.toInt)(i => start + i * step), Map.empty)
            case (w, RPairList(vs, _)) if w.startsWith("wrap_") && vs.nonEmpty =>
              vs.head._2 // wrapper state = CONS(wrapped, metadata)
            case _ => state
          }

        case other =>
          throw new IllegalStateException(s"unsupported SEXP type $other in data file")
      }
    }
  }

  /** Decode a column to strings (factor INTSXP via its levels; STRSXP
    * directly; numerics via toString). */
  def columnAsStrings(col: RObj): Vector[String] = col match {
    case RStrings(vs, _) => vs
    case RInts(vs, attr) =>
      attr.get("levels") match {
        case Some(RStrings(levels, _)) => vs.map(i => if (i >= 1) levels(i - 1) else null)
        case _                         => vs.map(_.toString)
      }
    case RReals(vs, _)    => vs.map(_.toString)
    case RLogicals(vs, _) => vs.map(_.toString)
    case other            => throw new IllegalArgumentException(s"not a column: $other")
  }

  private def namesOf(o: RObj): Vector[String] = o.attr.get("names") match {
    case Some(RStrings(ns, _)) => ns
    case _                     => Vector.empty
  }

  /** CSC slots of a Matrix::dgCMatrix S4 object → (nRows, nCols, rowNames,
    * colNames, (row, col, value) triplets). The reference's pbmc fixtures
    * (genes × cells) ship in this shape. */
  def dgcToTriplets(obj: RObj): (Int, Int, Vector[String], Vector[String],
      IndexedSeq[(Int, Int, Double)]) = {
    val s4 = obj match {
      case s: RS4 => s
      case other  => throw new IllegalArgumentException(s"not an S4 object: $other")
    }
    def slot(n: String): RObj = s4.attr.getOrElse(n,
      throw new IllegalArgumentException(s"dgCMatrix missing slot $n"))
    val i = slot("i").asInstanceOf[RInts].values
    val p = slot("p").asInstanceOf[RInts].values
    val x = slot("x").asInstanceOf[RReals].values
    val dim = slot("Dim").asInstanceOf[RInts].values
    val (rowNames, colNames) = slot("Dimnames") match {
      case RList(Vector(RStrings(rn, _), RStrings(cn, _)), _) => (rn, cn)
      case _ => (Vector.empty[String], Vector.empty[String])
    }
    val triplets = for {
      col <- 0 until dim(1)
      k <- p(col) until p(col + 1)
    } yield (i(k), col, x(k))
    (dim(0), dim(1), rowNames, colNames, triplets)
  }

  /** Convert a cell_lines-style fixture — a list of (meta_data data.frame,
    * scaled_pcs numeric data.frame) — to a Harmony-ready DataFrame:
    * (cell_id, features array<float>, <meta columns as strings>). */
  def fixtureToDf(spark: SparkSession, obj: RObj): DataFrame = {
    val top = obj match {
      case l: RList => l
      case other    => throw new IllegalArgumentException(s"expected list fixture, got $other")
    }
    val topNames = namesOf(top)
    def field(name: String): RObj =
      top.values(topNames.indexOf(name) match {
        case -1 => throw new IllegalArgumentException(s"fixture missing $name (has $topNames)")
        case i  => i
      })
    val meta = field("meta_data").asInstanceOf[RList]
    val pcs = field("scaled_pcs").asInstanceOf[RList]

    val metaNames = namesOf(meta).map(n =>
      if (n == "cell_id" || n == "features") s"meta_$n" else n)
    val metaCols: Vector[(String, Vector[String])] =
      metaNames.zip(meta.values.map(columnAsStrings)).toVector
    val pcCols: Vector[Vector[Double]] = pcs.values.map {
      case RReals(vs, _) => vs
      case RInts(vs, _)  => vs.map(_.toDouble)
      case other         => throw new IllegalArgumentException(s"non-numeric PC column: $other")
    }
    val n = pcCols.head.length
    require(metaCols.forall(_._2.length == n), "meta/PC row counts differ")

    val rows = (0 until n).map { i =>
      Row.fromSeq(
        i.toLong +:
          pcCols.map(c => c(i).toFloat).toArray +:
          metaCols.map(_._2(i)))
    }
    val schema = StructType(
      StructField("cell_id", LongType, nullable = false) +:
        StructField("features", ArrayType(FloatType, containsNull = false), nullable = false) +:
        metaCols.map(c => StructField(c._1, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
  }
}
