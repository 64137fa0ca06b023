package graft.config

import scala.collection.mutable

/** Minimal TOML parser covering the subset the reference's configs use
  * (SURVEY.md §7.1): `[table]` / `[[array-of-tables]]` headers with
  * dotted paths, `key = value` pairs, basic strings with escapes,
  * integers (incl. `_` separators), booleans, and flat arrays. No
  * external dependency — the offline build has no TOML library.
  */
object Toml {

  sealed trait Value
  final case class Str(v: String) extends Value
  final case class Num(v: Long) extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Arr(v: Vector[Value]) extends Value
  final case class Tbl(v: mutable.LinkedHashMap[String, Value]) extends Value

  def parse(text: String): Tbl = {
    val root = Tbl(mutable.LinkedHashMap.empty)
    var current = root
    for ((rawLine, idx) <- text.linesIterator.zipWithIndex) {
      val line = stripComment(rawLine).trim
      def fail(msg: String) =
        throw new IllegalArgumentException(s"TOML line ${idx + 1}: $msg in '$rawLine'")
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val path = line.substring(2, line.length - 2).trim.split('.').map(_.trim)
          current = appendArrayElement(root, path)
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val path = line.substring(1, line.length - 1).trim.split('.').map(_.trim)
          current = descend(root, path)
        } else {
          val eq = indexOfTopLevelEq(line)
          if (eq < 0) fail("expected key = value")
          val key = unquoteKey(line.substring(0, eq).trim)
          val value = parseValue(line.substring(eq + 1).trim)
            .getOrElse(fail("unsupported value"))
          current.v.put(key, value)
        }
      }
    }
    root
  }

  /** `[a.b.c]`: walk/create tables; an array segment means its last element. */
  private def descend(root: Tbl, path: Array[String]): Tbl =
    path.foldLeft(root) { (tbl, seg) =>
      tbl.v.getOrElseUpdate(seg, Tbl(mutable.LinkedHashMap.empty)) match {
        case t: Tbl => t
        case Arr(items) => items.last.asInstanceOf[Tbl]
        case other => throw new IllegalArgumentException(
          s"path segment '$seg' is a ${other.getClass.getSimpleName}, not a table")
      }
    }

  /** `[[a.b]]`: append a fresh table to the array at the path's tail. */
  private def appendArrayElement(root: Tbl, path: Array[String]): Tbl = {
    val parent = if (path.length == 1) root else descend(root, path.dropRight(1))
    val key = path.last
    val fresh = Tbl(mutable.LinkedHashMap.empty)
    parent.v.get(key) match {
      case Some(Arr(items)) => parent.v.put(key, Arr(items :+ fresh))
      case None             => parent.v.put(key, Arr(Vector(fresh)))
      case Some(other) => throw new IllegalArgumentException(
        s"'$key' already a ${other.getClass.getSimpleName}, not an array of tables")
    }
    fresh
  }

  // All three line scanners use the same string discipline: inside a
  // basic string a backslash CONSUMES the next character, so quote
  // parity survives any mix of \" and \\ (a trailing-escaped-backslash
  // before the closing quote broke the old looks-back-one-char check).

  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else {
        if (c == '"') inStr = true
        else if (c == '#') return line.substring(0, i)
      }
      i += 1
    }
    line
  }

  private def indexOfTopLevelEq(line: String): Int = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else {
        if (c == '"') inStr = true
        else if (c == '=') return i
      }
      i += 1
    }
    -1
  }

  private def unquoteKey(k: String): String =
    if (k.length >= 2 && k.startsWith("\"") && k.endsWith("\""))
      k.substring(1, k.length - 1)
    else k

  private[config] def parseValue(s: String): Option[Value] = s match {
    case "" => None
    case "true" => Some(Bool(true))
    case "false" => Some(Bool(false))
    case _ if s.length >= 2 && s.head == '"' && s.last == '"' &&
        !escapedTail(s) =>
      Some(Str(unescape(s.substring(1, s.length - 1))))
    case _ if s.startsWith("[") && s.endsWith("]") =>
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Some(Arr(Vector.empty))
      else {
        val parts = splitTopLevel(inner)
        val vals = parts.map(p => parseValue(p.trim))
        if (vals.forall(_.isDefined)) Some(Arr(vals.flatten.toVector)) else None
      }
    case _ =>
      val cleaned = s.replace("_", "")
      try Some(Num(java.lang.Long.parseLong(cleaned)))
      catch { case _: NumberFormatException => None }
  }

  /** The closing quote is escaped (odd number of preceding backslashes)
    * — i.e. the candidate string literal is actually unterminated. */
  private def escapedTail(s: String): Boolean = {
    var bs = 0
    var j = s.length - 2
    while (j >= 0 && s.charAt(j) == '\\') { bs += 1; j -= 1 }
    bs % 2 == 1
  }

  /** Split an array body on commas that are not inside strings. */
  private def splitTopLevel(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') inStr = false
      } else {
        if (c == '"') { inStr = true; cur.append(c) }
        else if (c == ',') { out += cur.toString; cur.clear() }
        else cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- typed accessors --------------------------------------------------

  implicit final class TblOps(private val t: Tbl) extends AnyVal {
    def str(k: String): Option[String] = t.v.get(k).collect { case Str(v) => v }
    def num(k: String): Option[Long] = t.v.get(k).collect { case Num(v) => v }
    def bool(k: String): Option[Boolean] = t.v.get(k).collect { case Bool(v) => v }
    def tbl(k: String): Option[Tbl] = t.v.get(k).collect { case x: Tbl => x }
    def arr(k: String): Vector[Value] =
      t.v.get(k).collect { case Arr(v) => v }.getOrElse(Vector.empty)
    def tables(k: String): Vector[Tbl] = arr(k).collect { case x: Tbl => x }
  }
}
