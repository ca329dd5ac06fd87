package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BitwiseCount, BitwiseXor, EqualTo, Expression, In, LessThan, LessThanOrEqual, Literal
}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.ann.Ann

/** Catalyst optimizer rule: rewrite ad-hoc Hamming-distance probes over an
  * LSH-bucketed store ([[graft.ann.Ann.writeLshBucketed]]) into
  * partition-pruned reads.
  *
  * A user who writes the natural query
  * {{{ store.filter(bit_count(sig ^ lit(qSig)) <= h) }}}
  * gets a FULL scan: the predicate alone says nothing the file source can
  * prune on. But the store is partitioned by `sig_prefix = sig >>> (numBits
  * − prefixBits)`, and by the pigeonhole principle a signature within
  * Hamming h of qSig can only live under the prefixes of the signatures
  * within h of qSig. The store stamps (numBits, prefixBits) into the `sig`
  * column's metadata (persisted in the parquet footer), so the rule can
  * synthesize `sig_prefix IN (probe prefixes)` and AND it onto the filter —
  * the file source then prunes directories exactly like the hand-built
  * [[graft.ann.Ann.lshTopKStored]] probe.
  *
  * Registered via `spark.sql.extensions=graft.exprs.GraftExtensions`
  * (config-time) or `spark.experimental.extraOptimizations` (runtime).
  * Idempotent: skips filters that already constrain `sig_prefix` (the
  * user-provided optimizer batch runs to fixed point).
  */
object HammingProbePruning extends Rule[LogicalPlan] {

  private val MaxProbeHamming = 4 // C(numBits, <=4) stays a small IN-list

  private def sigGeometry(a: AttributeReference): Option[(Int, Int)] = {
    val m = a.metadata
    if (m.contains("graft.lsh.numBits") && m.contains("graft.lsh.prefixBits"))
      Some((m.getLong("graft.lsh.numBits").toInt, m.getLong("graft.lsh.prefixBits").toInt))
    else None
  }

  /** Extract (sigAttr, qSig, maxHamming) from a Hamming-probe predicate. */
  private def probeOf(e: Expression): Option[(AttributeReference, Long, Int)] = {
    def longOf(l: Any): Long = l match {
      case i: Int => i.toLong
      case l: Long => l
      case other => other.toString.toLong
    }
    def xorArgs(x: Expression): Option[(AttributeReference, Long)] = x match {
      case BitwiseXor(a: AttributeReference, Literal(v, _)) => Some((a, longOf(v)))
      case BitwiseXor(Literal(v, _), a: AttributeReference) => Some((a, longOf(v)))
      case _ => None
    }
    e match {
      case LessThanOrEqual(BitwiseCount(x), Literal(h, _)) =>
        xorArgs(x).map { case (a, q) => (a, q, longOf(h).toInt) }
      case LessThan(BitwiseCount(x), Literal(h, _)) =>
        xorArgs(x).map { case (a, q) => (a, q, longOf(h).toInt - 1) }
      case EqualTo(BitwiseCount(x), Literal(h, _)) =>
        xorArgs(x).map { case (a, q) => (a, q, longOf(h).toInt) }
      case _ => None
    }
  }

  private def referencesPrefix(e: Expression): Boolean =
    e.references.exists(_.name == "sig_prefix")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if !referencesPrefix(cond) =>
      val probe = cond match {
        case And(l, r) => probeOf(l).orElse(probeOf(r))
        case other     => probeOf(other)
      }
      val rewritten = for {
        (sigAttr, qSig, h) <- probe
        if sigAttr.name == "sig" && h >= 0 && h <= MaxProbeHamming
        (numBits, prefixBits) <- sigGeometry(sigAttr)
        // attribution must be UNAMBIGUOUS: in a multi-relation plan (join /
        // self-join of two stores) child.output can expose several sig /
        // sig_prefix attributes, and pairing the probed sig with the OTHER
        // store's partition column would silently drop valid rows. Rewrite
        // only when exactly one of each exists and the probed sig IS it
        // (exprId match — name equality alone is unsound).
        sigAttrs = child.output.filter(_.name == "sig")
        prefixAttrs = child.output.collect {
          case a: AttributeReference if a.name == "sig_prefix" => a
        }
        if sigAttrs.size == 1 && sigAttrs.head.exprId == sigAttr.exprId &&
          prefixAttrs.size == 1
        prefixAttr = prefixAttrs.head
      } yield {
        // literals typed to the partition column (directory-name inference
        // usually yields IntegerType for small prefixes)
        def lit(p: Long): Literal = prefixAttr.dataType match {
          case org.apache.spark.sql.types.IntegerType => Literal(p.toInt)
          case org.apache.spark.sql.types.LongType    => Literal(p)
          case dt => Literal.create(p.toString, dt) // defensive; never hit for our stores
        }
        // probe-prefix set = the Hamming ball of radius min(h, prefixBits)
        // around the QUERY PREFIX over prefixBits bits — identical to
        // enumerating all C(numBits, <=h) full signatures and projecting
        // (any <=h flips touch <=h prefix bits), but C(prefixBits, <=h)
        // instead of C(numBits, <=h) driver-side values (64-bit stores at
        // h=4 would otherwise enumerate ~680k combinations per filter).
        val prefixes = Ann
          .sigsWithin(qSig >>> (numBits - prefixBits), prefixBits, math.min(h, prefixBits))
          .distinct
          .map(lit)
        Filter(And(In(prefixAttr, prefixes), cond), child)
      }
      rewritten.getOrElse(f)
  }
}
