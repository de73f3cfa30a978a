package graft.refio

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** C14 — symbol stemming (`tools/stemsymbol.cpp:53-123` +
  * `util/cppsplitter.cpp:7-38`): normalize Visual-Studio-demangled C++
  * symbols so they compare equal to GCC-demangled ones — the reference's
  * cross-compiler ground-truth prep (same stemmed symbol ⇒ same function
  * group, J5).
  *
  * Port notes: the replace chain and the return-type stemming mirror the
  * reference literally. One deviation: the reference's trailing-`[...]`
  * check indexes `tokens2` with `tokens.size()-1` (an out-of-bounds read
  * once leading tokens were popped — UB in the C++); we implement the
  * evident intent, "drop a trailing [bracketed] token".
  */
object SymbolStem {

  /** Space-split keeping (), <>, [] nesting intact
    * (`util/cppsplitter.cpp:7-38`). */
  def cppSplit(input: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var tokenStart = 0
    var i = 0
    while (i < input.length) {
      input.charAt(i) match {
        case '(' | '<' | '[' => depth += 1
        case ')' | '>' | ']' => depth -= 1
        case ' ' if depth == 0 =>
          out += input.substring(tokenStart, i)
          tokenStart = i + 1
        case _ =>
      }
      i += 1
    }
    out += input.substring(tokenStart)
    out.result()
  }

  private val Replaces: Seq[(String, String)] = Seq(
    "struct" -> "", "class" -> "", "enum" -> "",
    "(void)" -> "()", "& " -> "&", "," -> ", ", "bool&" -> "bool &",
    " *" -> "*", " __ptr64" -> "", "__ptr64" -> "", "__int64" -> "long",
    " &" -> "&", " ," -> ",", " )" -> ")")

  private def replaceAllLiteral(s: String, from: String, to: String): String = {
    // literal, left-to-right, resuming after the replacement (the
    // reference's replaceAll) — NOT regex
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.startsWith(from, i)) { sb.append(to); i += from.length }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  def stem(symbol0: String): String = {
    val symbol = Replaces.foldLeft(symbol0) { case (s, (f, t)) =>
      replaceAllLiteral(s, f, t)
    }
    if (symbol.forall(c => Character.isLetterOrDigit(c) || c == '_')) symbol
    else {
      // strip leading tokens with no "(" — the return type
      var toks = cppSplit(symbol).dropWhile(!_.contains("("))
      // drop a trailing [bracketed] token (e.g. "[clone .part.1]")
      if (toks.nonEmpty && toks.last.startsWith("[") && toks.last.length > 2)
        toks = toks.init
      // rejoin: no space after a token ending '(' or before a token
      // starting '&' (mirrors the stemsymbol.cpp:105-121 spacing rules)
      val sb = new StringBuilder
      var i = 0
      while (i < toks.length) {
        sb.append(toks(i))
        val remaining = toks.length - i
        val noSpace = remaining == 1 || toks(i).endsWith("(") ||
          (remaining > 2 && toks(i + 1).startsWith("&"))
        if (!noSpace) sb.append(' ')
        i += 1
      }
      replaceAllLiteral(sb.toString, "  ", " ")
    }
  }

  val stemUdf = udf((s: String) => stem(s))

  def stemCol(c: Column): Column = stemUdf(c)
}
