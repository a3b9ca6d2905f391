package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: rewrite interval-containment joins into
  * their bucketed equi-join form automatically.
  *
  * A join whose only condition is `pt >= lo AND pt <= hi` has no
  * equi-conjunct, so Spark can only plan it as a
  * BroadcastNestedLoopJoin (or a cartesian): O(|L|·|R|) compares —
  * the silent 100 TB killer. This rule detects the containment shape
  * on timestamp columns and rewrites it to the same plan
  * [[graft.operators.RangeJoin.pointInInterval]] builds by hand:
  * quantize time into `spark.graft.rangeJoin.bucketSeconds`-wide
  * buckets, explode each interval over the buckets it overlaps, tag
  * each point with its single bucket, and join on bucket EQUALITY
  * with the original predicate re-checked. Each matching pair meets
  * in exactly one bucket (the point's), so no dedup is needed and
  * results are identical — including null/inverted-interval rows,
  * which produce no buckets just as they fail the original predicate.
  *
  * Conservative by design: only INNER joins, only when NO equi
  * conjunct exists (with one, Spark already hash/merge-joins on it),
  * and only for TimestampType bounds. The rewrite introduces a bucket
  * equi-conjunct, so the rule never matches its own output.
  * Registered through [[GraftExtensions]]
  * (`.withExtensions(new GraftExtensions)` at session build).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSecondsConf = "spark.graft.rangeJoin.bucketSeconds"
  val MaxBucketsConf    = "spark.graft.rangeJoin.maxBucketsPerInterval"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(BucketSecondsConf, "3600").toLong
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, width).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // side classification: Some(true)=purely left, Some(false)=right
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // an equi conjunct between the sides → Spark hash-joins already
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    final case class Bound(pt: Expression, bound: Expression, ptOnLeft: Boolean)
    // deterministic only: the rewrite re-evaluates pt/bounds in the
    // bucket projection, which would double-evaluate a
    // non-deterministic expression
    def mk(pt: Expression, bound: Expression): Option[Bound] =
      for {
        ps <- sideOf(pt)
        bs <- sideOf(bound)
        if ps != bs && pt.dataType == TimestampType && bound.dataType == TimestampType
        if pt.deterministic && bound.deterministic
      } yield Bound(pt, bound, ps)
    def asLower(c: Expression): Option[Bound] = c match {
      case GreaterThanOrEqual(a, b) => mk(a, b) // pt >= lo
      case LessThanOrEqual(a, b)    => mk(b, a) // lo <= pt
      case _ => None
    }
    def asUpper(c: Expression): Option[Bound] = c match {
      case LessThanOrEqual(a, b)    => mk(a, b) // pt <= hi
      case GreaterThanOrEqual(a, b) => mk(b, a) // hi >= pt
      case _ => None
    }

    val pair = (for {
      lower <- conjuncts.flatMap(asLower)
      upper <- conjuncts.flatMap(asUpper)
      if lower.ptOnLeft == upper.ptOnLeft && lower.pt.semanticEquals(upper.pt)
    } yield (lower, upper)).headOption

    pair.map { case (lower, upper) =>
      // cast timestamp → long gives epoch seconds (floor); both sides
      // of a 1-second-resolution truncation land in the same
      // integer-second bucket, so containment survives quantization.
      // The timezone is set EXPLICITLY: optimizer rules run after the
      // analyzer's ResolveTimeZone pass, so a TimeZoneAwareExpression
      // (Cast, Sequence) left with timeZoneId=None stays unresolved
      // and fails plan validation.
      val tz = Some(conf.sessionLocalTimeZone)
      def bucketOf(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType, tz), Literal(width))
      val (pts, ivs) =
        if (lower.ptOnLeft) (left, right) else (right, left)
      val ptBucket = Alias(bucketOf(lower.pt), "__graft_bucket")()
      val ptsProj = Project(pts.output :+ ptBucket, pts)
      // inverted intervals (lo > hi) match nothing in the original
      // predicate; give them no buckets instead of a Sequence error.
      // A pathological interval spanning more than
      // spark.graft.rangeJoin.maxBucketsPerInterval buckets raises a
      // clear error naming the knobs — the silent alternative is a
      // single row exploding to tens of thousands (clamping would
      // silently DROP its matches beyond the clamp, so it errors)
      val maxBuckets = conf.getConfString(MaxBucketsConf, "8192").toLong
      val bLo = bucketOf(lower.bound)
      val bHi = bucketOf(upper.bound)
      val arrTy = ArrayType(LongType, containsNull = false)
      val tooWide = Cast(RaiseError(Concat(Seq(
        Literal(UTF8String.fromString("graft.RangeJoinRewrite: interval of "),
          org.apache.spark.sql.types.StringType),
        Cast(Add(Subtract(bHi, bLo), Literal(1L)),
          org.apache.spark.sql.types.StringType, tz),
        Literal(UTF8String.fromString(
          s" buckets exceeds $MaxBucketsConf=$maxBuckets at " +
            s"$BucketSecondsConf=$width — widen the bucket or raise the cap"),
          org.apache.spark.sql.types.StringType)))), arrTy, tz)
      val seqExpr = If(LessThanOrEqual(bLo, bHi),
        If(LessThan(Subtract(bHi, bLo), Literal(maxBuckets)),
          Sequence(bLo, bHi, Some(Literal(1L)), tz),
          tooWide),
        Literal.create(Seq.empty[Long], arrTy))
      val bucketAttr = AttributeReference("__graft_bucket_i", LongType, nullable = false)()
      val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr), child = ivs)
      val newCond = And(cond, EqualTo(ptBucket.toAttribute, bucketAttr))
      val newJoin =
        if (lower.ptOnLeft) Join(ptsProj, gen, Inner, Some(newCond), j.hint)
        else Join(gen, ptsProj, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}

/** SparkSessionExtensions hook: registers graft's optimizer rules.
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    e.injectOptimizerRule(_ => MvRewrite)
  }
}
