package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Envelope

/** Randomized invariants for the pure kernels (fixed seed, no Spark
  * session — they run per-generated-case and stay out of the JVM-heavy
  * specs).
  */
class PropertiesSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20240812L)

  private def randomFiniteDouble(): Double = rnd.nextInt(3) match {
    case 0 => (rnd.nextDouble() - 0.5) * 2e6
    case 1 => rnd.nextDouble() * 2 - 1
    case _ =>
      Iterator.continually(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        .dropWhile(d => d.isNaN || d.isInfinite).next()
  }

  test("pyFloatRepr round-trips 2000 random finite doubles, never >17 digits") {
    for (_ <- 1 to 2000) {
      val d = randomFiniteDouble()
      val s = Envelope.pyFloatRepr(d)
      assert(java.lang.Double.parseDouble(s) == d, s"repr $s of $d")
      val digits = s.replaceAll("[-.]|e.*", "").replaceAll("^0+", "")
      assert(digits.length <= 17, s"too many digits in $s")
    }
  }

  test("nyse rules: holidays/early closes are weekdays, bounded, disjoint for 1998-2100") {
    import graft.operators.NyseCalendar
    for (y <- 1998 to 2100) {
      val hol = NyseCalendar.ruleHolidays(y)
      assert(hol == hol.distinct.sorted, s"year $y")
      assert(hol.forall(_.getDayOfWeek.getValue <= 5), s"year $y") // never weekend
      assert(hol.size >= 8 && hol.size <= 11, s"year $y: ${hol.size}")
      val ec = NyseCalendar.earlyCloses(y)
      assert(ec == ec.distinct.sorted, s"year $y")
      assert(ec.forall(_.getDayOfWeek.getValue <= 5), s"year $y")
      assert(ec.size >= 1 && ec.size <= 3, s"year $y")
      assert(ec.intersect(hol).isEmpty, s"year $y") // half days trade
    }
  }

  private def randomScalar(): String = rnd.nextInt(6) match {
    case 0 => (rnd.nextInt(2000001) - 1000000).toString
    case 1 => Envelope.pyFloatRepr((rnd.nextDouble() - 0.5) * 2e6)
    case 2 => "\"" + rnd.alphanumeric.take(rnd.nextInt(12)).mkString + "\""
    case 3 => "true"
    case 4 => "false"
    case _ => "null"
  }

  test("canonicalize: idempotent and key-order independent on 500 random objects") {
    for (_ <- 1 to 500) {
      val fields = (1 to rnd.nextInt(7))
        .map(i => (rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString + i) -> randomScalar())
      val json = fields.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val shuffled = rnd.shuffle(fields)
        .map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val c1 = Envelope.canonicalize(json)
      assert(Envelope.canonicalize(c1) == c1, s"not idempotent on $json")
      assert(Envelope.canonicalize(shuffled) == c1, s"key-order dependent on $json")
    }
  }

  test("canonicalizeOrNull rescues malformed payloads as null") {
    assert(Envelope.canonicalizeOrNull("{broken") == null)
    assert(Envelope.canonicalizeOrNull("") == null)
    assert(Envelope.canonicalizeOrNull(null) == null)
    assert(Envelope.canonicalizeOrNull("""{"a":1}""") == """{"a": 1}""")
  }
}
