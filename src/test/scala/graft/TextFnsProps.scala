package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.TextFns

/** Scalacheck properties of the pure hash-family constants — the invariants
  * the cross-engine determinism argument rests on. */
object TextFnsProps extends Properties("TextFns") {
  val idx: Gen[Int] = Gen.choose(0, 255)
  val hash: Gen[Long] = Gen.choose(0L, TextFns.P - 1)

  property("A/B stay inside [0, P) so a*h+b never overflows a long") =
    Prop.forAll(idx) { i =>
      TextFns.A(i) >= 0 && TextFns.A(i) < TextFns.P &&
        TextFns.B(i) >= 0 && TextFns.B(i) < TextFns.P
    }

  property("affine permutation output stays inside [0, P)") =
    Prop.forAll(idx, hash) { (i, h) =>
      val g = (TextFns.A(i) * h + TextFns.B(i)) % TextFns.P
      g >= 0 && g < TextFns.P
    }

  property("a*h+b fits in a long before the mod (no silent overflow)") =
    Prop.forAll(idx, hash) { (i, h) =>
      val prod = BigInt(TextFns.A(i)) * BigInt(h) + BigInt(TextFns.B(i))
      prod <= BigInt(Long.MaxValue)
    }

  property("distinct slots get distinct permutations") =
    Prop.forAll(Gen.choose(0, 63), Gen.choose(0, 63)) { (i, j) =>
      i == j || TextFns.A(i) != TextFns.A(j) || TextFns.B(i) != TextFns.B(j)
    }
}
