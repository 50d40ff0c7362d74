package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.types.MySqlType

/** X6 — MySQL geometry WKB decode (SURVEY.md §2.8).
  *
  * Semantics re-expressed from the reference's struct-unpack parsers
  * (converter.py:86-135 point, 138-184 polygon, 187-271 multipolygon):
  *  - optional 4-byte big-endian SRID header (MySQL's internal geometry
  *    format always has it; bare WKB doesn't) — detected by length:
  *    point 25 vs 21 bytes, polygon/multipolygon `len > 25`;
  *  - per-geometry byte-order marker (0 big / 1 little), including a
  *    fresh marker per polygon inside a multipolygon;
  *  - only the OUTER ring of each polygon is kept; holes are skipped.
  *
  * Implemented as a native Catalyst `UnaryExpression` (CodegenFallback —
  * the parse is a byte-buffer walk; the surrounding projection still
  * codegens) rather than a Scala UDF: no ScalaUDF allocation/serialization
  * per batch, and the expression carries a precise `DataType` so the
  * struct/array output needs no post-hoc casting.
  */
sealed trait WkbKind
object WkbKind {
  case object Point extends WkbKind
  case object Polygon extends WkbKind
  case object MultiPolygon extends WkbKind
}

final case class WkbDecode(child: Expression, kind: WkbKind)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = kind match {
    case WkbKind.Point => MySqlType.pointStruct
    case WkbKind.Polygon =>
      ArrayType(MySqlType.pointStruct, containsNull = false)
    case WkbKind.MultiPolygon =>
      ArrayType(ArrayType(MySqlType.pointStruct, containsNull = false),
        containsNull = false)
  }

  override def prettyName: String = kind match {
    case WkbKind.Point => "wkb_point"
    case WkbKind.Polygon => "wkb_polygon"
    case WkbKind.MultiPolygon => "wkb_multipolygon"
  }

  override protected def withNewChildInternal(newChild: Expression): WkbDecode =
    copy(child = newChild)

  private def pointRow(p: (Double, Double)): InternalRow =
    InternalRow(p._1.toFloat, p._2.toFloat) // CH Tuple(x Float32, y Float32)

  private def ringArray(ps: Seq[(Double, Double)]): GenericArrayData =
    new GenericArrayData(ps.map(pointRow).toArray[Any])

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    kind match {
      case WkbKind.Point => pointRow(Wkb.parsePoint(bytes))
      case WkbKind.Polygon => ringArray(Wkb.parsePolygon(bytes))
      case WkbKind.MultiPolygon =>
        new GenericArrayData(
          Wkb.parseMultiPolygon(bytes).map(ringArray).toArray[Any])
    }
  }
}

object Wkb {

  // Resolved against the GraftFunctions registry entries (injected via
  // SparkSessionExtensions in GraftSession); `call_function` is the
  // public unresolved-function constructor.
  def decodePoint(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_wkb_point", c)
  def decodePolygon(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_wkb_polygon", c)
  def decodeMultiPolygon(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_wkb_multipolygon", c)

  // ------------------------------------------------------------- parsers

  private def buf(b: Array[Byte], offset: Int): ByteBuffer = {
    val bb = ByteBuffer.wrap(b)
    bb.position(offset)
    bb
  }

  private def setEndian(bb: ByteBuffer): Unit = (bb.get(): @annotation.switch) match {
    case 0 => bb.order(ByteOrder.BIG_ENDIAN)
    case 1 => bb.order(ByteOrder.LITTLE_ENDIAN)
    case o => throw new IllegalArgumentException(s"invalid WKB byte order $o")
  }

  private def expectType(bb: ByteBuffer, t: Int, what: String): Unit = {
    val got = bb.getInt()
    require(got == t, s"not a WKB $what (type $got)")
  }

  /** converter.py:86-135 — SRID iff length 25. */
  def parsePoint(b: Array[Byte]): (Double, Double) = {
    require(b.length == 21 || b.length == 25,
      s"invalid WKB POINT length ${b.length}")
    val bb = buf(b, if (b.length == 25) 4 else 0)
    setEndian(bb)
    expectType(bb, 1, "POINT")
    (bb.getDouble(), bb.getDouble())
  }

  private def readRing(bb: ByteBuffer): Seq[(Double, Double)] = {
    val n = bb.getInt()
    (0 until n).map(_ => (bb.getDouble(), bb.getDouble()))
  }

  private def skipRing(bb: ByteBuffer): Unit = {
    val n = bb.getInt()
    bb.position(bb.position() + 16 * n)
  }

  /** converter.py:138-184 — outer ring only; SRID iff length > 25. */
  def parsePolygon(b: Array[Byte]): Seq[(Double, Double)] = {
    val bb = buf(b, if (b.length > 25) 4 else 0)
    setEndian(bb)
    expectType(bb, 3, "POLYGON")
    val numRings = bb.getInt()
    if (numRings == 0) Nil else readRing(bb)
  }

  /** converter.py:187-271 — outer ring of each polygon, holes skipped;
    * each inner polygon re-reads its own byte-order marker. */
  def parseMultiPolygon(b: Array[Byte]): Seq[Seq[(Double, Double)]] = {
    val bb = buf(b, if (b.length > 25) 4 else 0)
    setEndian(bb)
    expectType(bb, 6, "MULTIPOLYGON")
    val numPolys = bb.getInt()
    (0 until numPolys).map { _ =>
      setEndian(bb)
      expectType(bb, 3, "POLYGON in MULTIPOLYGON")
      val numRings = bb.getInt()
      if (numRings == 0) Nil
      else {
        val outer = readRing(bb)
        (1 until numRings).foreach(_ => skipRing(bb))
        outer
      }
    }
  }

  // ---------------------------------------------------- encoders (tests)

  private def w(size: Int, little: Boolean): ByteBuffer =
    ByteBuffer.allocate(size).order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)

  private def header(bb: ByteBuffer, little: Boolean, tpe: Int): Unit = {
    bb.put(if (little) 1.toByte else 0.toByte)
    bb.putInt(tpe)
  }

  /** WKB POINT; `srid` prepends MySQL's 4-byte header. */
  def encodePoint(x: Double, y: Double, little: Boolean = true,
                  srid: Option[Int] = None): Array[Byte] = {
    val bb = w(srid.fold(21)(_ => 25), little)
    srid.foreach(s => bb.order(ByteOrder.BIG_ENDIAN).putInt(s).order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN))
    header(bb, little, 1)
    bb.putDouble(x).putDouble(y)
    bb.array()
  }

  /** WKB POLYGON with the given rings (first = outer). */
  def encodePolygon(rings: Seq[Seq[(Double, Double)]], little: Boolean = true,
                    srid: Option[Int] = None): Array[Byte] = {
    val size = srid.fold(0)(_ => 4) + 9 +
      rings.map(r => 4 + 16 * r.size).sum
    val bb = w(size, little)
    srid.foreach(s => bb.order(ByteOrder.BIG_ENDIAN).putInt(s).order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN))
    header(bb, little, 3)
    bb.putInt(rings.size)
    rings.foreach { r =>
      bb.putInt(r.size)
      r.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    }
    bb.array()
  }

  /** WKB MULTIPOLYGON of polygons (each with rings, first = outer). */
  def encodeMultiPolygon(polys: Seq[Seq[Seq[(Double, Double)]]],
                         little: Boolean = true,
                         srid: Option[Int] = None): Array[Byte] = {
    val size = srid.fold(0)(_ => 4) + 9 +
      polys.map(p => 9 + p.map(r => 4 + 16 * r.size).sum).sum
    val bb = w(size, little)
    srid.foreach(s => bb.order(ByteOrder.BIG_ENDIAN).putInt(s).order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN))
    header(bb, little, 6)
    bb.putInt(polys.size)
    polys.foreach { p =>
      header(bb, little, 3)
      bb.putInt(p.size)
      p.foreach { r =>
        bb.putInt(r.size)
        r.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
      }
    }
    bb.array()
  }
}
