package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

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
  * bands × 6 bits). Band multiplicity is removed by grouping on a
  * per-side row identity injected below each Generate, so duplicate
  * identical input rows keep their original pair multiplicity — the
  * only semantics delta vs the cartesian join is the recall
  * approximation itself (and the rewrite only fires on joins with no
  * other equi-predicate, where the alternative is the full cartesian
  * scan). Rows with a null vector are filtered beneath the Generate:
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
      bands: Int, bits: Int): (LogicalPlan, Attribute, Attribute) = {
    // A null vector cannot satisfy the cosine threshold (the conjunct
    // evaluates to null, never true), so filtering it beneath the
    // Generate is semantics-preserving — and it makes the band-key
    // attribute's declared non-nullability actually hold:
    // SignLshBandExpr is only nullable through a null input vector.
    val notNull = Filter(IsNotNull(vec), side)
    // Per-input-row identity: band-collision dedup groups on it so a
    // qualifying pair emits once per INPUT row pair, preserving the
    // multiplicity of duplicate identical input rows (a DISTINCT over
    // the bare join output would collapse those too).
    // CAVEAT (documented, not fixed): MonotonicallyIncreasingID carries
    // Spark's standard indeterminacy under shuffle-stage RETRY — if a
    // fetch-failure re-run reorders this side's rows, a row's band
    // copies can straddle two rid values and a qualifying pair emits
    // twice. Same exposure as every monotonically_increasing_id-based
    // dedup; the rewrite is opt-in and its oracle gate runs retry-free.
    // A deterministic fix needs a content-independent stable id
    // (zipWithIndex over a sorted child), which costs an extra sort.
    val rid = Alias(MonotonicallyIncreasingID(), name + "_rid")()
    val withId = Project(side.output :+ rid, notNull)
    val attr = AttributeReference(name, LongType, nullable = false)()
    val gen = Generate(
      Explode(CreateArray((0 until bands).map(k =>
        SignLshBandExpr(vec, k, bits)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(attr), child = withId)
    (gen, attr, rid.toAttribute)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, bands: Int, bits: Int)
      : Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (hasEquiKey(conjuncts, left, right)) return None
    thresholdConjunct(conjuncts, left, right).map { case (lv, rv) =>
      val (bl, la, lid) = banded(left, lv, "__lsh_band_l", bands, bits)
      val (br, ra, rid) = banded(right, rv, "__lsh_band_r", bands, bits)
      val newCond = (EqualTo(la, ra) +: conjuncts).reduce(And)
      val joined = Join(bl, br, Inner, Some(newCond), hint)
      val out = j.output
      // Group on the per-side row identities (plus the output columns
      // they functionally determine) so each qualifying input-row pair
      // emits exactly once across band collisions while duplicate
      // identical input rows keep their original multiplicity.
      Aggregate(Seq(lid, rid) ++ out, out, joined)
    }
  }
}
