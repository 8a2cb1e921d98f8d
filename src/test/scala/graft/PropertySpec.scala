package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.query.QueryAst._
import graft.query.RelationParser

/** Property-based coverage of the pure query layer (no SparkSession):
  * relation parse/evaluate agrees with a direct truth-table evaluation,
  * and the includeZero matrix never admits an inconsistent state. */
class PropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  // Raw-ScalaCheck driver (the scalatest bridge isn't on the classpath):
  // deterministic seeds, 200 cases per property.
  private def cases[A](gen: Gen[A])(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      body(gen.pureApply(params, Seed(42L + i)))
    }
  }

  private def evalRel(r: Relation, bits: Vector[Boolean]): Boolean = r match {
    case Relation.Ref(i)    => bits(i)
    case Relation.And(a, b) => evalRel(a, bits) && evalRel(b, bits)
    case Relation.Or(a, b)  => evalRel(a, bits) || evalRel(b, bits)
  }

  private def render(r: Relation): String = r match {
    case Relation.Ref(i)    => s"$$$i"
    case Relation.And(a, b) => s"(${render(a)} and ${render(b)})"
    case Relation.Or(a, b)  => s"(${render(a)} or ${render(b)})"
  }

  private val nConds = 4
  private def genRel(depth: Int): Gen[Relation] =
    if (depth == 0) Gen.choose(0, nConds - 1).map(Relation.Ref)
    else Gen.frequency(
      2 -> Gen.choose(0, nConds - 1).map(Relation.Ref(_): Relation),
      1 -> (for { a <- genRel(depth - 1); b <- genRel(depth - 1) } yield Relation.And(a, b)),
      1 -> (for { a <- genRel(depth - 1); b <- genRel(depth - 1) } yield Relation.Or(a, b)))

  private val genBits: Gen[Vector[Boolean]] =
    Gen.containerOfN[Vector, Boolean](nConds, Gen.oneOf(true, false))

  test("relation round-trips through the parser with identical truth table") {
    cases(for { r <- genRel(4); b <- genBits } yield (r, b)) { case (r, bits) =>
      val parsed = RelationParser.parse(render(r), nConds, Map.empty)
      assert(parsed.isRight, parsed)
      assert(evalRel(parsed.toOption.get, bits) == evalRel(r, bits))
    }
  }

  test("parser-expanded includeZero is consistent with the count target") {
    import graft.query.{QueryParser, QueryValidationException}
    val ops = Seq("==", "!=", ">", ">=", "<", "<=")
    cases(for {
      op <- Gen.oneOf(ops)
      v <- Gen.choose(0L, 5L)
      iz <- Gen.oneOf(Option.empty[Boolean], Some(true), Some(false))
    } yield (op, v, iz)) { case (op, v, iz) =>
      val izJson = iz.map(b => s""","includeZero":$b""").getOrElse("")
      val json =
        s"""{"query":{"conditions":[{"filter":["t","==","x"],"target":["count","$op",$v]$izJson}]}}"""
      try {
        val q = QueryParser.parse(json)
        val c = q.conditions.head.asInstanceOf[Condition.Filters]
        val Target.Count(cop, cv) = c.target: @unchecked
        // Invariant: includeZero=true is only ever accepted when a count of
        // zero could actually satisfy the target.
        val zeroSatisfies = cop match {
          case CmpOp.Eq  => cv == 0
          case CmpOp.Neq => cv != 0
          case CmpOp.Gt  => false
          case CmpOp.Gte => cv == 0
          case CmpOp.Lt  => cv > 0
          case CmpOp.Lte => true
        }
        if (c.includeZero) assert(zeroSatisfies, s"op=$op v=$v iz=$iz")
        // count==0 must always end with includeZero=true
        if (cop == CmpOp.Eq && cv == 0) assert(c.includeZero)
      } catch {
        case _: QueryValidationException => () // rejected combinations are fine
      }
    }
  }
}
