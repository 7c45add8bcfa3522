package graft.frontends

/** Shared string-literal escape decoding for the hand-rolled front-end
  * lexers (Cypher / GQL / SPARQL / Gremlin / GraphQL). All five source
  * grammars define the same core escape set — openCypher §"Expressions"
  * string literals, SPARQL 1.1 grammar ECHAR/UCHAR, the GraphQL spec's
  * StringValue EscapedCharacter/EscapedUnicode, Groovy string escapes for
  * Gremlin — so one decoder keeps them aligned (reference analog: each
  * grafeo adapter crate decodes these in its own parser).
  */
object Lexing {

  private def isHex(c: Char): Boolean =
    c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')

  /** Decode ONE escape sequence whose backslash sits at `i` (`q(i) == '\\'`),
    * appending the decoded character(s) to `sb`; returns the index just past
    * the sequence. Standard escapes map to their characters: `\n \t \r \b
    * \f` to the control character, `\uXXXX` to the UTF-16 code unit,
    * `\UXXXXXXXX` (SPARQL UCHAR) to the code point, and any other escaped
    * character — `\"` `\'` `\\` `\/` included — to the character itself.
    * That last rule doubles as lenient pass-through for escapes outside the
    * shared set (and for a malformed `\u` with too few hex digits), so a
    * sloppy literal degrades to its visible characters instead of failing
    * the whole query.
    */
  def readEscape(q: String, i: Int, sb: StringBuilder): Int = {
    val n = q.length
    if (i + 1 >= n) { sb += q(i); return i + 1 } // trailing backslash: literal
    q(i + 1) match {
      case 'n' => sb += '\n'; i + 2
      case 't' => sb += '\t'; i + 2
      case 'r' => sb += '\r'; i + 2
      case 'b' => sb += '\b'; i + 2
      case 'f' => sb += '\f'; i + 2
      case 'u' if i + 5 < n && (i + 2 to i + 5).forall(j => isHex(q(j))) =>
        sb += Integer.parseInt(q.substring(i + 2, i + 6), 16).toChar
        i + 6
      case 'U' if i + 9 < n && (i + 2 to i + 9).forall(j => isHex(q(j))) &&
          Character.isValidCodePoint(
            java.lang.Long.parseLong(q.substring(i + 2, i + 10), 16).min(Int.MaxValue).toInt) =>
        // parse as Long: 8 hex digits can exceed Int.MaxValue, and values
        // past U+10FFFF (or surrogates) fall through to lenient pass-through
        // below instead of throwing out of Character.toChars
        sb ++= new String(Character.toChars(
          java.lang.Long.parseLong(q.substring(i + 2, i + 10), 16).toInt))
        i + 10
      case c => sb += c; i + 2
    }
  }
}
