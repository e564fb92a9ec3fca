package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CosineSimilarityExpr, SignLshBandExpr}

/** Opt-in Catalyst optimizer rule: rewrites a brute-force
  * cosine-threshold join
  *
  * {{{ left.join(right, cosine_similarity(l.vec, r.vec) >= t) }}}
  *
  * — which plans as a cartesian/nested-loop O(|L|·|R|) scan — into a
  * sign-LSH banded EQUI-join: both sides explode into `bands` band keys
  * ([[SignLshBandExpr]]: `bits` hyperplane signs + the band id in one
  * long), the join becomes a hash/sort-merge join on the band key, and
  * the ORIGINAL cosine predicate is kept as the exact post-filter, so
  * every emitted pair genuinely satisfies the threshold. This is the
  * SURVEY §7.3 "LSH rewrite" — the plan-level form of the q34c/q35d
  * blocking discipline, applied by the optimizer instead of by hand.
  *
  * APPROXIMATE BY DESIGN, hence opt-in (`spark.graft.lsh.joinRewrite.
  * enabled`, default false): a qualifying pair whose `bands` band keys
  * all differ is not produced (recall for a pair at angle θ is
  * 1−(1−(1−θ/π)^bits)^bands — ≥ 0.98 at cosine 0.9 with the default 8
  * bands × 6 bits). Band multiplicity is removed by the
  * FIRST-MATCHING-BAND filter: each side carries its full band array
  * under the Generate and a joined row survives only when no earlier
  * band also matches — a deterministic, map-side dedup (band values
  * are pure content functions, so a shuffle-stage retry re-derives the
  * same single emission; no per-row identity, no dedup shuffle).
  * Duplicate identical input rows keep their original pair
  * multiplicity — the only semantics delta vs the cartesian join is
  * the recall approximation itself (and the rewrite only fires on
  * joins with no other equi-predicate, where the alternative is the
  * full cartesian scan). Rows with a null vector are filtered beneath the Generate:
  * they cannot satisfy the threshold conjunct, and the filter makes
  * the band-key attribute genuinely non-nullable.
  *
  * Scale shape: band keys are computed map-side inside codegen
  * (O(dims·bits·bands) per row), the shuffle carries `bands`× each
  * side (vs |L|·|R| pairs for the nested loop), and bucket sizes are
  * data-adaptive the same way q34c's are. The rule only ever REPLACES
  * a cartesian — a join that already has an equi-key is left alone.
  */
object LshJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledKey = "spark.graft.lsh.joinRewrite.enabled"
  val BandsKey = "spark.graft.lsh.joinRewrite.bands"
  val BitsKey = "spark.graft.lsh.joinRewrite.bits"

  private def intConf(key: String, dflt: Int): Int =
    try SQLConf.get.getConfString(key, dflt.toString).toInt
    catch { case _: NumberFormatException => dflt }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledKey, "false").toBoolean) return plan
    val bands = math.max(1, intConf(BandsKey, 8))
    val bits = math.min(16, math.max(1, intConf(BitsKey, 6)))
    plan.transformUp {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, bands, bits).getOrElse(j)
    }
  }

  /** The cosine-threshold conjunct, oriented as (leftVec, rightVec, t). */
  private def thresholdConjunct(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    conjuncts.collectFirst {
      case GreaterThanOrEqual(c @ CosineSimilarityExpr(a, b), Literal(t, _))
          if positive(t) => orient(a, b, left, right)
      case GreaterThan(c @ CosineSimilarityExpr(a, b), Literal(t, _))
          if positive(t) => orient(a, b, left, right)
      case LessThanOrEqual(Literal(t, _), c @ CosineSimilarityExpr(a, b))
          if positive(t) => orient(a, b, left, right)
      case LessThan(Literal(t, _), c @ CosineSimilarityExpr(a, b))
          if positive(t) => orient(a, b, left, right)
    }.flatten

  private def positive(t: Any): Boolean = t match {
    case d: java.lang.Double => d > 0.0
    case f: java.lang.Float  => f > 0.0f
    case _                   => false
  }

  private def orient(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
    else if (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)) Some((b, a))
    else None

  /** True if any conjunct is already a cross-side equi-predicate — the
    * join then hash-plans on it and the rewrite has nothing to win
    * (this also terminates the fixed point: our own output joins on
    * the injected band-key equality). */
  private def hasEquiKey(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet))
      case _ => false
    }

  private def banded(side: LogicalPlan, vec: Expression, name: String,
      bands: Int, bits: Int): (LogicalPlan, Attribute, Attribute, Attribute) = {
    // A null vector cannot satisfy the cosine threshold (the conjunct
    // evaluates to null, never true), so filtering it beneath the
    // Generate is semantics-preserving — and it makes the band-key
    // attribute's declared non-nullability actually hold:
    // SignLshBandExpr is only nullable through a null input vector.
    val notNull = Filter(IsNotNull(vec), side)
    // The full band array rides along under the Generate so the
    // first-matching-band dedup filter (see rewrite) can test earlier
    // bands in-row — band values are pure content functions, so the
    // whole dedup is DETERMINISTIC under shuffle-stage retry (r15
    // verdict fix #3: the former MonotonicallyIncreasingID identity
    // could double-emit a pair after a fetch-failure recompute).
    val arr = Alias(CreateArray((0 until bands).map(k =>
      SignLshBandExpr(vec, k, bits))), name + "_arr")()
    val withArr = Project(side.output :+ arr, notNull)
    val pos = AttributeReference(name + "_pos", IntegerType, nullable = false)()
    val attr = AttributeReference(name, LongType, nullable = false)()
    val gen = Generate(
      PosExplode(arr.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(pos, attr), child = withArr)
    (gen, attr, pos, arr.toAttribute)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, bands: Int, bits: Int)
      : Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (hasEquiKey(conjuncts, left, right)) return None
    thresholdConjunct(conjuncts, left, right).map { case (lv, rv) =>
      val (bl, la, lpos, larr) = banded(left, lv, "__lsh_band_l", bands, bits)
      val (br, ra, _, rarr) = banded(right, rv, "__lsh_band_r", bands, bits)
      val newCond = (EqualTo(la, ra) +: conjuncts).reduce(And)
      val joined = Join(bl, br, Inner, Some(newCond), hint)
      // Band-collision dedup WITHOUT a per-row identity: a qualifying
      // pair emits only at its FIRST matching band — keep the joined
      // row iff no band j < lpos also matches (the band id is packed
      // into the key's high bits, so la = ra already implies equal band
      // index on both sides). Each input-row pair passes for exactly
      // one band, so duplicate identical input rows keep their original
      // multiplicity — and unlike the former rid + Aggregate, this is a
      // map-side filter (no dedup shuffle) over values that are pure
      // functions of row content (retry-deterministic). Unrolled
      // statically over the ≤ bands−1 earlier indices; stays inside
      // whole-stage codegen.
      val earlierMatch = (0 until bands - 1).map { jj =>
        And(GreaterThan(lpos, Literal(jj)),
          EqualTo(GetArrayItem(larr, Literal(jj)),
            GetArrayItem(rarr, Literal(jj))))
      }.reduceOption[Expression](Or)
      val firstOnly = earlierMatch.map(Not(_)).getOrElse(Literal.TrueLiteral)
      Project(j.output, Filter(firstOnly, joined))
    }
  }
}
