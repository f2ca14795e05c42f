package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the parity-critical pure kernels (SURVEY §5:
  * ScalaCheck for invariants the reference only spot-checks). Each kernel
  * is checked against an independent model implementation over random
  * input (including multi-byte unicode), plus the algebraic invariants
  * the oracle-parity design depends on (order independence of the exact
  * decimal sum, determinism of bucket assignment).
  */
object KernelProps extends Properties("ExprKernels") {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val word: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.oneOf("é", "λ", "語", "a b".take(1)))
  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(word, Gen.const(""), Gen.const(" "))).map(_.mkString(" "))

  private def utf8Arr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  property("tokens == split-and-drop-empties model") = forAll(text) { t =>
    val got = ExprKernels.tokens(UTF8String.fromString(t))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    got == t.split(" ", -1).filter(_.nonEmpty).toSeq
  }

  property("shingles3 == distinct sliding-3 model") = forAll(text) { t =>
    val toks = t.split(" ", -1).filter(_.nonEmpty).toSeq
    val model =
      if (toks.size < 3) Seq.empty
      else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
    val got = ExprKernels.shingles3(UTF8String.fromString(t))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    got == model
  }

  property("simhash == md5-bit-voting model") =
    forAll(Gen.listOf(word), Gen.choose(1, 64)) { (toks, bits) =>
      val bal = new Array[Int](bits)
      toks.foreach { tok =>
        val hex = md5hex(tok)
        for (j <- 1 to bits) {
          val nib = Integer.parseInt(hex((j + 3) / 4 - 1).toString, 16)
          val bit = (nib >> (3 - (j - 1) % 4)) & 1
          bal(j - 1) += bit * 2 - 1
        }
      }
      val model = (1 to bits).map(j => if (bal(j - 1) >= 0) 1L << (j - 1) else 0L).sum
      ExprKernels.simHash(utf8Arr(toks), bits) == model
    }

  property("minHashSigs == min-of-keyed-md5 model") =
    forAll(Gen.listOf(word.filter(_.nonEmpty)), Gen.choose(1, 8)) { (shingles, k) =>
      val got = ExprKernels.minHashSigs(utf8Arr(shingles), k)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(Option(_).map(_.toString)).toSeq
      val model = (1 to k).map { h =>
        if (shingles.isEmpty) None
        else Some(shingles.map(s => md5hex(s"$h|$s")).min)
      }
      got == model
    }

  private val vec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f)).map(_.toArray)

  property("decimalDot == BigDecimal fold model") = forAll(vec) { v =>
    val a = new GenericArrayData(v)
    val b = new GenericArrayData(v.reverse)
    val model = v.zip(v.reverse).foldLeft(JBigDecimal.ZERO) { case (acc, (x, y)) =>
      acc.add(JBigDecimal.valueOf(x.toDouble * y.toDouble)
        .setScale(20, RoundingMode.HALF_UP))
    }.doubleValue()
    ExprKernels.decimalDot(a, b) == model
  }

  // full float range — subnormals, huge magnitudes, zeros — drives every
  // branch of the fixed-point parser (negative shift, two-step multiply,
  // BigDecimal fallback); the result must stay bit-identical to the model
  private val extremeVec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.const(0f), Gen.const(-0f), Gen.const(1e-40f), Gen.const(-1e-45f),
      Gen.const(3e38f), Gen.const(-2.5e38f), Gen.const(1e-20f),
      Gen.chooseNum(-1e19f, 1e19f), Gen.chooseNum(-1f, 1f),
      Gen.chooseNum(-100f, 100f))).map(_.toArray)

  property("decimalDot == model on extreme magnitudes") =
    forAll(extremeVec) { v =>
      val a = new GenericArrayData(v)
      val b = new GenericArrayData(v.reverse)
      val model = v.zip(v.reverse).foldLeft(JBigDecimal.ZERO) { case (acc, (x, y)) =>
        acc.add(JBigDecimal.valueOf(x.toDouble * y.toDouble)
          .setScale(20, RoundingMode.HALF_UP))
      }.doubleValue()
      ExprKernels.decimalDot(a, b) == model
    }

  property("decimalDot is order-independent (oracle-parity invariant)") =
    forAll(vec) { v =>
      val pairs = v.zipWithIndex
      val perm = scala.util.Random.javaRandomToRandom(new java.util.Random(v.length))
        .shuffle(pairs.toSeq)
      val a1 = new GenericArrayData(pairs.map(_._1))
      val b1 = new GenericArrayData(pairs.map(p => v(v.length - 1 - p._2)))
      val a2 = new GenericArrayData(perm.map(_._1).toArray)
      val b2 = new GenericArrayData(perm.map(p => v(v.length - 1 - p._2)).toArray)
      ExprKernels.decimalDot(a1, b1) == ExprKernels.decimalDot(a2, b2)
    }

  // products in ~1e16..1e19 land in the band where a 128-bit scale-20
  // accumulator can overflow without per-term/flush guards — pin that the
  // guarded fast path still equals the BigDecimal model there
  private val hugeVec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.chooseNum(8e8f, 4e9f),
      Gen.chooseNum(-4e9f, -8e8f), Gen.chooseNum(-1f, 1f))).map(_.toArray)

  property("decimalDot == model in the accumulator-overflow band") =
    forAll(hugeVec) { v =>
      val a = new GenericArrayData(v)
      val b = new GenericArrayData(v.reverse)
      val model = v.zip(v.reverse).foldLeft(JBigDecimal.ZERO) { case (acc, (x, y)) =>
        acc.add(JBigDecimal.valueOf(x.toDouble * y.toDouble)
          .setScale(20, RoundingMode.HALF_UP))
      }.doubleValue()
      ExprKernels.decimalDot(a, b) == model
    }

  property("decimalDot throws on NaN/Infinity like BigDecimal.valueOf") =
    forAll(Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)) { bad =>
      val a = new GenericArrayData(Array(1.0f, bad))
      val b = new GenericArrayData(Array(1.0f, 1.0f))
      Prop(scala.util.Try(ExprKernels.decimalDot(a, b)).failed.toOption
        .exists(_.isInstanceOf[NumberFormatException]))
    }

  property("doubleDot == left-to-right IEEE fold; within 1.4e-14·Σ|aᵢbᵢ| of decimalDot") =
    forAll(vec) { v =>
      val a = new GenericArrayData(v)
      val b = new GenericArrayData(v.reverse)
      val model = v.zip(v.reverse).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      val sumAbs = v.zip(v.reverse).map { case (x, y) => math.abs(x.toDouble * y.toDouble) }.sum
      val dd = ExprKernels.doubleDot(a, b)
      dd == model &&
        math.abs(dd - ExprKernels.decimalDot(a, b)) <= math.max(sumAbs * 1.4e-14, 1e-15)
    }

  property("rpProject == independently derived md5-plane BigDecimal model") =
    forAll(vec, Gen.choose(1, 16)) { (v, k) =>
      // plane values re-derived HERE from the documented formula
      // (r(h,i) = ((md5("h|i")[0:6hex] % 1000) - 500)/1000.0) — an
      // independent spelling, not a call into the kernel's own cache
      def plane(h: Int, dim: Int): Array[Double] =
        Array.tabulate(dim) { i0 =>
          val hex6 = java.lang.Long.parseLong(md5hex(s"$h|${i0 + 1}").take(6), 16)
          ((hex6 % 1000) - 500) / 1000.0
        }
      val got = ExprKernels.rpProject(new GenericArrayData(v), k)
        .toDoubleArray().toSeq
      val model = (1 to k).map { h =>
        val r = plane(h, v.length)
        v.zip(r).foldLeft(JBigDecimal.ZERO) { case (acc, (x, rv)) =>
          val p = x.toDouble * rv
          if (p == 0.0) acc
          else acc.add(JBigDecimal.valueOf(p).setScale(20, RoundingMode.HALF_UP))
        }.doubleValue()
      }
      got == model
    }

  property("lshBucket is deterministic and within 2^planes") =
    forAll(vec, Gen.choose(1, 16)) { (v, planes) =>
      val a = new GenericArrayData(v)
      val b1 = ExprKernels.lshBucket(a, planes)
      val b2 = ExprKernels.lshBucket(new GenericArrayData(v.clone()), planes)
      Prop(b1 == b2 && b1 >= 0 && b1 < (1L << planes))
    }

  // Zeros and tiny magnitudes push the double sums toward the fallback
  // threshold; the guarded fast sign must agree with the exact decimal
  // path everywhere, or bucket assignment diverges from the oracle SQL.
  private val edgeVec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.const(0f), Gen.chooseNum(-1e-6f, 1e-6f),
      Gen.chooseNum(-100f, 100f))).map(_.toArray)

  property("lshBucket guarded fast path == always-exact path") =
    forAll(edgeVec, Gen.choose(1, 32)) { (v, planes) =>
      val a = new GenericArrayData(v)
      ExprKernels.lshBucket(a, planes) == ExprKernels.lshBucketExact(a, planes)
    }

  // the model the text_langid_ngram oracle executes: count positions i
  // where the 3-char window equals any pattern (sliding, overlapping)
  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)

  property("ngramHits == sliding-window membership model") =
    forAll(asciiText, Gen.nonEmptyListOf(
      Gen.listOfN(3, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))) { (t, pats0) =>
      val pats = pats0.distinct
      val model = (0 to t.length - 3).count(i => pats.contains(t.substring(i, i + 3)))
      val got = ExprKernels.ngramHits(
        UTF8String.fromString(t), pats.map(UTF8String.fromString).toArray)
      got == model.toLong
    }

  // FixedSum's parse kernel vs the BigDecimal semantics it must replicate
  // bit-for-bit (CAST(double AS DECIMAL(38,s)) = valueOf + setScale
  // HALF_UP). Generator spans magnitudes 1e-12..1e12 with both signs —
  // the shortest-repr fraction/exponent forms and every rounding branch.
  private val anyDouble: Gen[Double] = for {
    m <- Gen.choose(-1.0, 1.0)
    e <- Gen.choose(-12, 12)
    d = m * math.pow(10, e)
    if !d.isNaN
  } yield d

  property("FixedPoint.units == BigDecimal.valueOf.setScale(HALF_UP).unscaled") =
    forAll(anyDouble, Gen.oneOf(0, 2, 4, 6, 8)) { (d, s) =>
      (math.abs(d) >= 9.2e18 / math.pow(10, s)) || // out of the 64-bit domain
        FixedPoint.units(d, s) ==
          JBigDecimal.valueOf(d).setScale(s, RoundingMode.HALF_UP)
            .unscaledValue().longValueExact()
    }
}
