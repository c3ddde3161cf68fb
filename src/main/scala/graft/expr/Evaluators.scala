package graft.expr

import graft.meta.{DataFile, FieldSummary, SingleValue}
import graft.spec.{IcebergSchema, IcebergType, PartitionSpec, Transform}
import graft.spec.IcebergType._

/** Metadata-pruning evaluators — the reference's visitor family re-expressed
  * directly over our models:
  *   - [[InclusiveProjection]]: data predicate → partition-space predicate
  *     (expr/visitors/inclusive_projection.rs + spec/transform.rs project)
  *   - [[ManifestEvaluator]]: prune manifests via partition FieldSummaries
  *     (expr/visitors/manifest_evaluator.rs)
  *   - [[ExpressionEvaluator]]: prune files via exact partition values
  *     (expr/visitors/expression_evaluator.rs)
  *   - [[InclusiveMetricsEvaluator]]: prune files via column min/max/null/nan
  *     stats (expr/visitors/inclusive_metrics_evaluator.rs)
  *
  * All are *inclusive*: "true" means rows MIGHT match. Anything that can't
  * be decided from stats returns true — pruning must never drop a matching
  * row (Catalyst re-applies the full filter above the scan).
  */
object InclusiveProjection {

  /** Project a bound data predicate into the partition space of `spec`.
    * Refs in the output are partition-field names. */
  def project(p: Predicate, schema: IcebergSchema, spec: PartitionSpec): Predicate =
    p match {
      case AlwaysTrue => AlwaysTrue
      case AlwaysFalse => AlwaysFalse
      case And(l, r) => project(l, schema, spec) and project(r, schema, spec)
      case Or(l, r) => project(l, schema, spec) or project(r, schema, spec)
      case Not(c) => project(Predicate.rewriteNot(Not(c)), schema, spec)
      case UnaryPred(op, ref) =>
        // null/nan survive identity only (transforms map null→null but nan
        // buckets to a value)
        partFieldsFor(ref, schema, spec).collectFirst {
          case (pf, _) if pf.transform == Transform.Identity => UnaryPred(op, pf.name): Predicate
        }.getOrElse(AlwaysTrue)
      case BinaryPred(op, ref, v) =>
        combine(partFieldsFor(ref, schema, spec).map { case (pf, srcType) =>
          projectBinary(op, v, pf.transform, pf.name, srcType)
        })
      case SetPred(In, ref, vs) =>
        combine(partFieldsFor(ref, schema, spec).map { case (pf, srcType) =>
          if (vs.exists(_ == null)) AlwaysTrue
          else SetPred(In, pf.name, vs.map(v => pf.transform.applyValue(v, srcType))): Predicate
        })
      case SetPred(NotIn, _, _) => AlwaysTrue // inexact through any transform
    }

  private def combine(ps: Seq[Predicate]): Predicate =
    ps.foldLeft(AlwaysTrue: Predicate)(_ and _)

  private def partFieldsFor(ref: String, schema: IcebergSchema, spec: PartitionSpec) = {
    val id = schema.findField(ref).map(_.id)
    spec.fields.filter(pf => id.contains(pf.sourceId))
      .map(pf => pf -> schema.idToField(pf.sourceId).fieldType)
  }

  /** Binary-op projection through a transform (ProjectionUtil semantics in
    * spec/transform.rs): order-preserving transforms project ranges with
    * boundary adjustment; bucket projects equality only. */
  private def projectBinary(op: BinaryOp, v: Any, t: Transform, outName: String,
      srcType: IcebergType): Predicate = {
    if (v == null) return AlwaysTrue
    t match {
      case Transform.Identity => BinaryPred(op, outName, v)
      case Transform.Void => AlwaysTrue
      case Transform.Bucket(_) => op match {
        case Eq => BinaryPred(Eq, outName, t.applyValue(v, srcType))
        case _ => AlwaysTrue
      }
      case _ if t.preservesOrder => op match {
        case Eq => BinaryPred(Eq, outName, t.applyValue(v, srcType))
        case Lt => prevValue(v, srcType) match {
          case Some(pv) => BinaryPred(LtEq, outName, t.applyValue(pv, srcType))
          case None => AlwaysTrue
        }
        case LtEq => BinaryPred(LtEq, outName, t.applyValue(v, srcType))
        case Gt => nextValue(v, srcType) match {
          case Some(nv) => BinaryPred(GtEq, outName, t.applyValue(nv, srcType))
          case None => AlwaysTrue
        }
        case GtEq => BinaryPred(GtEq, outName, t.applyValue(v, srcType))
        case NotEq | NotStartsWith => AlwaysTrue
        case StartsWith => t match {
          case Transform.Truncate(w) if srcType == StringT =>
            val s = v.asInstanceOf[String]
            if (s.length >= w) BinaryPred(StartsWith, outName, s.substring(0, w))
            else BinaryPred(StartsWith, outName, s)
          case _ => AlwaysTrue
        }
      }
      case _ => AlwaysTrue
    }
  }

  private def prevValue(v: Any, t: IcebergType): Option[Any] = t match {
    case IntT | DateT => Some(v.asInstanceOf[Int] - 1)
    case LongT | TimeT | TimestampT | TimestamptzT => Some(v.asInstanceOf[Long] - 1L)
    case _ => None
  }

  private def nextValue(v: Any, t: IcebergType): Option[Any] = t match {
    case IntT | DateT => Some(v.asInstanceOf[Int] + 1)
    case LongT | TimeT | TimestampT | TimestamptzT => Some(v.asInstanceOf[Long] + 1L)
    case _ => None
  }
}

/** Prune whole manifests with partition-field summaries (min/max/null/nan). */
object ManifestEvaluator {

  /** @param partPred partition-space predicate (refs = partition field names)
    * @return true iff the manifest MIGHT contain matching rows */
  def manifestMightMatch(partPred: Predicate, summaries: Seq[FieldSummary],
      spec: PartitionSpec, schema: IcebergSchema): Boolean = {
    if (summaries.isEmpty) return true
    val partType = spec.partitionType(schema)
    eval(partPred, ref => {
      val i = spec.fields.indexWhere(_.name == ref)
      if (i < 0 || i >= summaries.size) None
      else Some((summaries(i), partType.fields(i).fieldType))
    })
  }

  private def eval(p: Predicate, lookup: String => Option[(FieldSummary, IcebergType)]): Boolean =
    p match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => eval(l, lookup) && eval(r, lookup)
      case Or(l, r) => eval(l, lookup) || eval(r, lookup)
      case Not(c) => eval(Predicate.rewriteNot(Not(c)), lookup)
      case UnaryPred(op, ref) => lookup(ref) match {
        case None => true
        case Some((s, _)) => op match {
          case IsNull => s.containsNull
          case NotNull => !(s.containsNull && s.lowerBound.isEmpty && s.upperBound.isEmpty)
          case IsNan => s.containsNan.getOrElse(true)
          case NotNan => true
        }
      }
      case BinaryPred(op, ref, v) => lookup(ref) match {
        case None => true
        case Some((s, t)) => binaryMightMatch(op, v, s.lowerBound, s.upperBound, t)
      }
      case SetPred(In, ref, vs) => lookup(ref) match {
        case None => true
        case Some((s, t)) => vs.exists(v => binaryMightMatch(Eq, v, s.lowerBound, s.upperBound, t))
      }
      case SetPred(NotIn, _, _) => true
    }

  /** Shared bounds check: might any value in [lower, upper] satisfy op v? */
  private[expr] def binaryMightMatch(op: BinaryOp, v: Any, lower: Option[Any],
      upper: Option[Any], t: IcebergType): Boolean = {
    if (v == null) return false // comparisons with null match nothing
    def cmpLower = lower.map(lb => SingleValue.compare(t, lb, v))
    def cmpUpper = upper.map(ub => SingleValue.compare(t, ub, v))
    op match {
      case Lt => cmpLower.forall(_ < 0)
      case LtEq => cmpLower.forall(_ <= 0)
      case Gt => cmpUpper.forall(_ > 0)
      case GtEq => cmpUpper.forall(_ >= 0)
      case Eq => cmpLower.forall(_ <= 0) && cmpUpper.forall(_ >= 0)
      case NotEq => true
      case StartsWith => (t, v) match {
        case (StringT, prefix: String) =>
          // compare truncated bounds in UTF-8 byte order (same total order
          // as SingleValue.compare) — UTF-16 `<` would mis-prune around
          // supplementary characters
          val lo = lower.map(_.asInstanceOf[String])
          val hi = upper.map(_.asInstanceOf[String])
          lo.forall(l => SingleValue.compare(StringT, l.take(prefix.length), prefix) <= 0) &&
            hi.forall(h => SingleValue.compare(StringT, h.take(prefix.length), prefix) >= 0)
        case _ => true
      }
      case NotStartsWith => true
    }
  }
}

/** Prune files by exact partition values (refs = partition field names). */
object ExpressionEvaluator {

  def partitionMatches(partPred: Predicate, values: Seq[Any], spec: PartitionSpec,
      schema: IcebergSchema): Boolean = {
    val partType = spec.partitionType(schema)
    eval(partPred, ref => {
      val i = spec.fields.indexWhere(_.name == ref)
      if (i < 0 || i >= values.size) None
      else Some((values(i), partType.fields(i).fieldType))
    })
  }

  private def eval(p: Predicate, lookup: String => Option[(Any, IcebergType)]): Boolean =
    p match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => eval(l, lookup) && eval(r, lookup)
      case Or(l, r) => eval(l, lookup) || eval(r, lookup)
      case Not(c) => eval(Predicate.rewriteNot(Not(c)), lookup)
      case UnaryPred(op, ref) => lookup(ref) match {
        case None => true
        case Some((v, _)) => op match {
          case IsNull => v == null
          case NotNull => v != null
          case IsNan => SingleValue.isNaN(v)
          case NotNan => !SingleValue.isNaN(v)
        }
      }
      case BinaryPred(op, ref, lit) => lookup(ref) match {
        case None => true
        case Some((v, t)) =>
          if (v == null || lit == null) false
          else op match {
            case Lt => SingleValue.compare(t, v, lit) < 0
            case LtEq => SingleValue.compare(t, v, lit) <= 0
            case Gt => SingleValue.compare(t, v, lit) > 0
            case GtEq => SingleValue.compare(t, v, lit) >= 0
            case Eq => SingleValue.compare(t, v, lit) == 0
            case NotEq => SingleValue.compare(t, v, lit) != 0
            case StartsWith => v.asInstanceOf[String].startsWith(lit.asInstanceOf[String])
            case NotStartsWith => !v.asInstanceOf[String].startsWith(lit.asInstanceOf[String])
          }
      }
      case SetPred(In, ref, vs) => lookup(ref) match {
        case None => true
        case Some((v, t)) => v != null && vs.exists(x => x != null && SingleValue.compare(t, v, x) == 0)
      }
      case SetPred(NotIn, ref, vs) => lookup(ref) match {
        case None => true
        case Some((v, t)) => v != null && !vs.exists(x => x != null && SingleValue.compare(t, v, x) == 0)
      }
    }
}

/** Prune files by column min/max/null/nan counts ("rows might match"). */
object InclusiveMetricsEvaluator {

  def fileMightMatch(dataPred: Predicate, file: DataFile, schema: IcebergSchema): Boolean =
    eval(dataPred, file, schema)

  private def eval(p: Predicate, f: DataFile, schema: IcebergSchema): Boolean = p match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => eval(l, f, schema) && eval(r, f, schema)
    case Or(l, r) => eval(l, f, schema) || eval(r, f, schema)
    case Not(c) => eval(Predicate.rewriteNot(Not(c)), f, schema)
    case UnaryPred(op, ref) => withField(ref, schema) { id =>
      op match {
        case IsNull => f.nullValueCounts.get(id).forall(_ > 0)
        case NotNull => !allNull(f, id)
        case IsNan => f.nanValueCounts.get(id).forall(_ > 0)
        case NotNan =>
          // reference rule: cannot match only when every value is NaN
          (f.nanValueCounts.get(id), f.valueCounts.get(id)) match {
            case (Some(nan), Some(vc)) if vc > 0 => nan < vc
            case _ => true
          }
      }
    }
    case BinaryPred(op, ref, v) => withField(ref, schema) { id =>
      if (allNull(f, id)) false
      else ManifestEvaluator.binaryMightMatch(op, v, f.lowerBounds.get(id),
        f.upperBounds.get(id), schema.idToField(id).fieldType)
    }
    case SetPred(In, ref, vs) => withField(ref, schema) { id =>
      if (allNull(f, id)) false
      else vs.exists(v => ManifestEvaluator.binaryMightMatch(Eq, v,
        f.lowerBounds.get(id), f.upperBounds.get(id), schema.idToField(id).fieldType))
    }
    case SetPred(NotIn, _, _) => true
  }

  private def withField(ref: String, schema: IcebergSchema)(body: Int => Boolean): Boolean =
    schema.findField(ref).map(fld => body(fld.id)).getOrElse(true)

  private[expr] def allNull(f: DataFile, id: Int): Boolean =
    (f.valueCounts.get(id), f.nullValueCounts.get(id)) match {
      case (Some(vc), Some(nc)) => vc == nc && vc > 0
      case _ => false
    }
}

/** "Rows MUST match" from column stats
  * (expr/visitors/strict_metrics_evaluator.rs semantics): true only when
  * the bounds PROVE every row in the file satisfies the predicate.
  * Anything undecidable returns false — the dual of the inclusive
  * evaluator. Used to turn row-level deletes into whole-file drops and to
  * skip residual filters on fully-covered files. */
object StrictMetricsEvaluator {

  def fileMustMatch(dataPred: Predicate, file: DataFile, schema: IcebergSchema): Boolean =
    eval(dataPred, file, schema)

  private def eval(p: Predicate, f: DataFile, schema: IcebergSchema): Boolean = p match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => eval(l, f, schema) && eval(r, f, schema)
    case Or(l, r) => eval(l, f, schema) || eval(r, f, schema)
    case Not(c) => eval(Predicate.rewriteNot(Not(c)), f, schema)
    case UnaryPred(op, ref) => withField(ref, schema) { (id, _) =>
      op match {
        case IsNull => InclusiveMetricsEvaluator.allNull(f, id)
        case NotNull => f.nullValueCounts.get(id).contains(0L)
        case IsNan => false // nan counts are not harvested: never provable
        case NotNan => false
      }
    }
    case BinaryPred(op, ref, v) => withField(ref, schema) { (id, t) =>
      // any null row fails a value comparison → must have zero nulls; for
      // float/double, parquet min/max exclude NaN, so a file containing NaN
      // rows could be "proven" to match a bound it doesn't satisfy — require
      // a harvested nan count of exactly 0 (absent counts are unprovable),
      // mirroring strict_metrics_evaluator.rs:122,275,352.
      if (!f.nullValueCounts.get(id).contains(0L) || !provablyNanFree(f, id, t)) false
      else {
        val lower = f.lowerBounds.get(id)
        val upper = f.upperBounds.get(id)
        def cmpLower = lower.map(lb => SingleValue.compare(t, lb, v))
        def cmpUpper = upper.map(ub => SingleValue.compare(t, ub, v))
        op match {
          case Lt => cmpUpper.exists(_ < 0)
          case LtEq => cmpUpper.exists(_ <= 0)
          case Gt => cmpLower.exists(_ > 0)
          case GtEq => cmpLower.exists(_ >= 0)
          case Eq => cmpLower.exists(_ == 0) && cmpUpper.exists(_ == 0)
          case NotEq => cmpUpper.exists(_ < 0) || cmpLower.exists(_ > 0)
          case StartsWith | NotStartsWith => false // not provable from bounds
        }
      }
    }
    case SetPred(In, ref, vs) => withField(ref, schema) { (id, t) =>
      // provable only when the file is a single value contained in the set
      if (!f.nullValueCounts.get(id).contains(0L) || !provablyNanFree(f, id, t)) false
      else (f.lowerBounds.get(id), f.upperBounds.get(id)) match {
        case (Some(lo), Some(hi)) if SingleValue.compare(t, lo, hi) == 0 =>
          vs.exists(v => v != null && SingleValue.compare(t, lo, v) == 0)
        case _ => false
      }
    }
    case SetPred(NotIn, ref, vs) => withField(ref, schema) { (id, t) =>
      if (!f.nullValueCounts.get(id).contains(0L) || !provablyNanFree(f, id, t)) false
      else (f.lowerBounds.get(id), f.upperBounds.get(id)) match {
        case (Some(lo), Some(hi)) =>
          vs.forall(v => v != null &&
            (SingleValue.compare(t, v, lo) < 0 || SingleValue.compare(t, v, hi) > 0))
        case _ => false
      }
    }
  }

  private def withField(ref: String, schema: IcebergSchema)(
      body: (Int, IcebergType) => Boolean): Boolean =
    schema.findField(ref).exists(fld => body(fld.id, fld.fieldType))

  /** NaN counts are opt-in at write time (write.collect-nan-counts), so a
    * missing count means "may contain NaN" and blocks the strict proof. */
  private def provablyNanFree(f: DataFile, id: Int, t: IcebergType): Boolean = t match {
    case IcebergType.FloatT | IcebergType.DoubleT => f.nanValueCounts.get(id).contains(0L)
    case _ => true
  }
}

/** Strict projection into partition space
  * (transform project_strict semantics): the projected predicate holds on
  * a partition tuple ONLY IF every row in that partition matches the data
  * predicate. Unprojectable shapes return AlwaysFalse (the safe strict
  * default — never claim a whole-partition match you can't prove). */
object StrictProjection {

  def project(p: Predicate, schema: IcebergSchema, spec: PartitionSpec): Predicate =
    p match {
      case AlwaysTrue => AlwaysTrue
      case AlwaysFalse => AlwaysFalse
      case And(l, r) => project(l, schema, spec) and project(r, schema, spec)
      case Or(l, r) =>
        // strict OR: provable iff either side is provable partition-wide
        Predicate.simplifyOr(project(l, schema, spec), project(r, schema, spec))
      case Not(c) => project(Predicate.rewriteNot(Not(c)), schema, spec)
      case UnaryPred(op, ref) =>
        partFieldsFor(ref, schema, spec).collectFirst {
          case (pf, _) if pf.transform == Transform.Identity =>
            UnaryPred(op, pf.name): Predicate
        }.getOrElse(AlwaysFalse)
      case BinaryPred(op, ref, v) =>
        anyOf(partFieldsFor(ref, schema, spec).map { case (pf, srcType) =>
          strictBinary(op, v, pf.transform, pf.name, srcType)
        })
      case SetPred(In, ref, vs) =>
        anyOf(partFieldsFor(ref, schema, spec).map { case (pf, _) =>
          if (pf.transform == Transform.Identity && !vs.exists(_ == null))
            SetPred(In, pf.name, vs): Predicate
          else AlwaysFalse
        })
      case SetPred(NotIn, ref, vs) =>
        anyOf(partFieldsFor(ref, schema, spec).map { case (pf, srcType) =>
          if (vs.exists(_ == null)) AlwaysFalse
          // f(x) ∉ f(S) ⇒ x ∉ S for any function f
          else SetPred(NotIn, pf.name, vs.map(v => pf.transform.applyValue(v, srcType))): Predicate
        })
    }

  private def anyOf(ps: Seq[Predicate]): Predicate =
    ps.foldLeft(AlwaysFalse: Predicate)(Predicate.simplifyOr)

  private def partFieldsFor(ref: String, schema: IcebergSchema, spec: PartitionSpec) = {
    val id = schema.findField(ref).map(_.id)
    spec.fields.filter(pf => id.contains(pf.sourceId))
      .map(pf => pf -> schema.idToField(pf.sourceId).fieldType)
  }

  private def strictBinary(op: BinaryOp, v: Any, t: Transform, outName: String,
      srcType: IcebergType): Predicate = {
    if (v == null) return AlwaysFalse
    t match {
      case Transform.Identity => BinaryPred(op, outName, v)
      case Transform.Void => AlwaysFalse
      case _ =>
        val fv = t.applyValue(v, srcType)
        op match {
          // order-preserving transforms: f(x) < f(v) ⇒ x < v ⇒ x ≤ v
          case Lt | LtEq if t.preservesOrder => BinaryPred(Lt, outName, fv)
          case Gt | GtEq if t.preservesOrder => BinaryPred(Gt, outName, fv)
          // any transform: f(x) ≠ f(v) ⇒ x ≠ v
          case NotEq => BinaryPred(NotEq, outName, fv)
          case _ => AlwaysFalse // Eq through a lossy transform is never strict
        }
    }
  }
}
