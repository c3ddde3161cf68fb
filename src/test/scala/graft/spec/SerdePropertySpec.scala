package graft.spec

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.SingleValue
import graft.puffin.Roaring64
import graft.spec.IcebergType._

/** Property tests for the serde layers where a silent bug drops rows:
  * single-value stats bounds, roaring bitmaps, metadata JSON. */
class SerdePropertySpec extends AnyFunSuite {

  /** scalatestplus bridge isn't in deps: drive ScalaCheck gens directly. */
  private def forAll[A](g: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  test("single-value serde round-trips every primitive") {
    forAll(Gen.oneOf[(IcebergType, Gen[Any])](
      (IntT, Arbitrary.arbitrary[Int]),
      (LongT, Arbitrary.arbitrary[Long]),
      (FloatT, Arbitrary.arbitrary[Float].suchThat(!_.isNaN)),
      (DoubleT, Arbitrary.arbitrary[Double].suchThat(!_.isNaN)),
      (DateT, Gen.chooseNum(-100000, 100000)),
      (TimestampT, Arbitrary.arbitrary[Long]),
      (StringT, Gen.asciiPrintableStr),
      (BooleanT, Arbitrary.arbitrary[Boolean])).flatMap {
        case (t, g) => g.map(v => (t, v))
      }) { case (t, v) =>
      val back = SingleValue.fromBytes(t, SingleValue.toBytes(t, v))
      assert(back === v)
      assert(SingleValue.compare(t, back, v) === 0)
    }
  }

  test("single-value string compare is unsigned UTF-8 byte order") {
    forAll(Gen.listOfN(2, Gen.oneOf(
      Gen.asciiPrintableStr, Gen.const("😀"), Gen.const("Ａ"),
      Gen.const(""), Gen.const("z�")))) { case List(a, b) =>
      val byBytes = java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val cmp = SingleValue.compare(StringT, a, b)
      assert(Integer.signum(cmp) === Integer.signum(byBytes))
    }
  }

  test("roaring64 round-trips arbitrary position sets") {
    // scalars across containers + CONTIGUOUS ranges (exercising the run
    // writer: run/array/bitmap choices, container-boundary straddles)
    val range: Gen[Seq[Long]] = for {
      start <- Gen.oneOf(Gen.chooseNum(0L, 200000L),
        Gen.chooseNum(0L, 1000L).map(_ + 65530L)) // straddle a container edge
      len <- Gen.chooseNum(1L, 9000L)
    } yield start until (start + len)
    val positions = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(0L, 100000L).map(Seq(_)),
      Gen.chooseNum(0L, 1L << 40).map(Seq(_)),
      Gen.chooseNum(0L, 5000L).map(v => Seq(v + (1L << 20))),
      range)).map(_.flatten)
    forAll(positions) { ps =>
      val set = ps.toSet
      val bm = Roaring64.fromPositions(set)
      assert(bm.cardinality === set.size)
      val back = Roaring64.deserialize(bm.serialize())
      assert(back.iterator.toSeq === set.toSeq.sorted)
      if (set.nonEmpty) {
        assert(set.forall(back.contains))
        assert(!back.contains(set.max + 1))
      }
    }
  }

  test("predicate negate is an involution and rewriteNot removes Nots") {
    import graft.expr._
    val leaf: Gen[Predicate] = Gen.oneOf(
      Gen.chooseNum(-1000, 1000).map(v => BinaryPred(Lt, "a", v)),
      Gen.chooseNum(-1000, 1000).map(v => BinaryPred(GtEq, "a", v)),
      Gen.chooseNum(-1000, 1000).map(v => BinaryPred(Eq, "a", v)),
      Gen.const(UnaryPred(IsNull, "a")),
      Gen.listOf(Gen.chooseNum(-5, 5)).map(vs =>
        SetPred(In, "a", vs.map(_.asInstanceOf[Any]).toSet)))
    def tree(depth: Int): Gen[Predicate] =
      if (depth == 0) leaf
      else Gen.oneOf(leaf,
        Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (l, r) => And(l, r) },
        Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (l, r) => Or(l, r) },
        tree(depth - 1).map(Not(_)))
    forAll(tree(3)) { p =>
      // double negation is identity up to Not-elimination (negate folds
      // Not(x) to x's negated operator, so compare normalized forms)
      assert(Predicate.rewriteNot(p.negate.negate) === Predicate.rewriteNot(p))
      def hasNot(q: graft.expr.Predicate): Boolean = q match {
        case Not(_) => true
        case And(l, r) => hasNot(l) || hasNot(r)
        case Or(l, r) => hasNot(l) || hasNot(r)
        case _ => false
      }
      assert(!hasNot(Predicate.rewriteNot(p)))
    }
  }

  test("table metadata JSON round-trips with schemas, specs, refs") {
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "v", DecimalT(18, 4), required = false),
      NestedField(3, "ts", TimestamptzT, required = false)))
    forAll(Gen.zip(Gen.chooseNum(0L, Long.MaxValue),
        Gen.alphaNumStr.suchThat(_.nonEmpty)), n = 50) {
      case (snapId, refName) =>
        val spec = PartitionSpec.build(schema, Seq("ts" -> Transform.Day))
        val md0 = TableMetadata.newTable("/w/t", schema, spec, Map("k" -> "v"))
        val md = md0.copy(
          snapshots = Seq(Snapshot(snapId, None, 1L, 123L, "/w/t/m.avro",
            "append", Map("n" -> "1"), Some(0))),
          currentSnapshotId = Some(snapId),
          refs = Map(refName -> SnapshotRef(snapId, "tag")))
        val back = TableMetadata.fromJsonString(md.toJsonString)
        assert(back.currentSchema === schema)
        assert(back.defaultSpec === spec)
        assert(back.refs === md.refs)
        assert(back.currentSnapshot.map(_.snapshotId) === Some(snapId))
        assert(back.properties === md.properties)
    }
  }
}
