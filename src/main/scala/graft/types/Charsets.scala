package graft.types

/** MySQL charset name → Java `Charset` name, the JVM twin of the
  * reference's CHARSET_MYSQL_TO_PYTHON map (converter.py:19-62): text
  * bytes coming off the wire are decoded with the table/column charset
  * before landing in a String column (converter.py:643-648).
  *
  * Unsupported charsets map to None and fall back to UTF-8, like the
  * reference's `or 'utf-8'` fallback.
  */
object Charsets {

  private val mysqlToJava: Map[String, String] = Map(
    "ascii" -> "US-ASCII",
    "big5" -> "Big5",
    "binary" -> "ISO-8859-1", // opaque bytes round-trip through latin-1
    "cp1250" -> "windows-1250",
    "cp1251" -> "windows-1251",
    "cp1256" -> "windows-1256",
    "cp1257" -> "windows-1257",
    "cp850" -> "IBM850",
    "cp852" -> "IBM852",
    "cp866" -> "IBM866",
    "cp932" -> "windows-31j",
    "dec8" -> "ISO-8859-1",
    "eucjpms" -> "EUC-JP",
    "euckr" -> "EUC-KR",
    "gb18030" -> "GB18030",
    "gb2312" -> "GB2312",
    "gbk" -> "GBK",
    "greek" -> "ISO-8859-7",
    "hebrew" -> "ISO-8859-8",
    "hp8" -> "ISO-8859-1",
    "koi8r" -> "KOI8-R",
    "koi8u" -> "KOI8-U",
    "latin1" -> "windows-1252", // MySQL latin1 IS cp1252 (converter.py:45)
    "latin2" -> "ISO-8859-2",
    "latin5" -> "ISO-8859-9",
    "latin7" -> "ISO-8859-13",
    "macce" -> "x-MacCentralEurope",
    "macroman" -> "x-MacRoman",
    "sjis" -> "Shift_JIS",
    "tis620" -> "TIS-620",
    "ucs2" -> "UTF-16BE",
    "ujis" -> "EUC-JP",
    "utf16" -> "UTF-16",
    "utf16le" -> "UTF-16LE",
    "utf32" -> "UTF-32",
    "utf8" -> "UTF-8",
    "utf8mb3" -> "UTF-8",
    "utf8mb4" -> "UTF-8")

  /** Java charset for a MySQL charset/collation-prefix name; UTF-8 when
    * unknown/unsupported (armscii8, geostd8, keybcs2, swe7...). */
  def javaName(mysqlCharset: String): String =
    mysqlToJava.getOrElse(mysqlCharset.toLowerCase, "UTF-8")
}
