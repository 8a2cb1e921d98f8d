package graft.query

import QueryAst.Relation

/**
 * Parser for the `relation` boolean expression over conditions, e.g.
 * `"$0 and ($1 or $seq)"`. Grammar (mirrors the reference's PEG at
 * frocket/common/validation/relation_parser.py:42-52):
 *
 *   expression = term (op term)*
 *   term       = identifier | '(' expression ')'
 *   identifier = '$' [0-9]+  |  '$' [A-Za-z][A-Za-z0-9_]*
 *   op         = 'and' | 'or' | '&&' | '||'
 *
 * `and`/`&&` bind tighter than `or`/`||` (standard precedence). Condition
 * names are resolved case-insensitively against the query's named conditions
 * (reference: consts.py map_condition_names lower-cases names).
 */
object RelationParser {

  def parse(text: String, conditionCount: Int, names: Map[String, Int]): Either[String, Relation] =
    new RelationParser(text, conditionCount, names).parseAll()

  /** Identifier validity for condition/aggregation names (reference
    * VALID_IDENTIFIER_PATTERN: starts with a letter, then letters/digits/_). */
  private[query] val IdentPattern = "^[A-Za-z][A-Za-z0-9_]*$".r
  def isValidIdentifier(s: String): Boolean = IdentPattern.matches(s)
}

private final class RelationParser(text: String, conditionCount: Int, names: Map[String, Int]) {
  import QueryAst.Relation._
  private var pos = 0

  def parseAll(): Either[String, Relation] =
    try {
      val e = parseOr()
      skipWs()
      if (pos < text.length) Left(s"Unexpected trailing input at offset $pos in relation '$text'")
      else Right(e)
    } catch { case ex: RelationSyntaxError => Left(ex.getMessage) }

  private def parseOr(): Relation = {
    var left = parseAnd()
    var more = true
    while (more) {
      skipWs()
      if (eat("or") || eat("||")) left = Or(left, parseAnd())
      else more = false
    }
    left
  }

  private def parseAnd(): Relation = {
    var left = parseTerm()
    var more = true
    while (more) {
      skipWs()
      if (eat("and") || eat("&&")) left = And(left, parseTerm())
      else more = false
    }
    left
  }

  private def parseTerm(): Relation = {
    skipWs()
    if (pos >= text.length) fail("Unexpected end of relation expression")
    text.charAt(pos) match {
      case '(' =>
        pos += 1
        val e = parseOr()
        skipWs()
        if (pos < text.length && text.charAt(pos) == ')') { pos += 1; e }
        else fail(s"Expected ')' at offset $pos in relation '$text'")
      case '$' =>
        pos += 1
        val start = pos
        while (pos < text.length && (text.charAt(pos).isLetterOrDigit || text.charAt(pos) == '_')) pos += 1
        val ident = text.substring(start, pos)
        if (ident.isEmpty) fail(s"Expected condition reference after '$$' at offset $start")
        if (ident.forall(_.isDigit)) {
          val idx = ident.toInt
          if (idx >= conditionCount) fail(s"Condition no. $idx does not exist")
          Ref(idx)
        } else {
          names.get(ident.toLowerCase) match {
            case Some(idx) => Ref(idx)
            case None      => fail(s"Condition named '$ident' does not exist")
          }
        }
      case c => fail(s"Unexpected character '$c' at offset $pos in relation '$text'")
    }
  }

  /** Consume `tok` if present; wordy ops must not run into an identifier. */
  private def eat(tok: String): Boolean = {
    if (text.regionMatches(pos, tok, 0, tok.length)) {
      val end = pos + tok.length
      val wordy = tok.head.isLetter
      val boundaryOk = !wordy || end >= text.length || {
        val c = text.charAt(end)
        !(c.isLetterOrDigit || c == '_')
      }
      if (boundaryOk) { pos = end; true } else false
    } else false
  }

  private def skipWs(): Unit = while (pos < text.length && text.charAt(pos).isWhitespace) pos += 1

  private def fail(msg: String): Nothing = throw new RelationSyntaxError(msg)
}

private final class RelationSyntaxError(msg: String) extends RuntimeException(msg)
